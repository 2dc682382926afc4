.PHONY: test bench native tables clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C soundkit_tpu/native

tables:
	python -m soundkit_tpu.native.tools.extract_tables

clean:
	$(MAKE) -C soundkit_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
