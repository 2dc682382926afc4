"""Extract ISO/IEC spec tables (AAC + MP3) from the system libavcodec
static archive into committed .npz files.

The AAC-LC and MP3 entropy decoders in this framework are written from
scratch, but the spec's Huffman codebooks and band tables are large
published data tables.  With zero network egress, the system
libavcodec.a is the authoritative local source of that data: this tool
links a tiny dumper against the archive's table objects (globalizing
the file-local MP3 tables via objcopy) and dumps the raw arrays.

Run:  python -m soundkit_tpu.native.tools.extract_tables
Outputs: soundkit_tpu/native/generated/{aac_tables.npz,mp3_tables.npz}
"""
from __future__ import annotations

import subprocess
import tempfile
from pathlib import Path

import numpy as np

ARCHIVE = "/usr/lib/x86_64-linux-gnu/libavcodec.a"
OUT_DIR = Path(__file__).resolve().parent.parent / "generated"

DUMPER = r"""
#include <cstdio>
#include <cstdint>
#include <cstring>

extern "C" {
// aactab.o
extern const uint16_t * const ff_aac_spectral_codes[11];
extern const uint8_t * const ff_aac_spectral_bits[11];
extern const uint16_t ff_aac_spectral_sizes[11];
extern const uint32_t ff_aac_scalefactor_code[121];
extern const uint8_t ff_aac_scalefactor_bits[121];
extern const uint8_t ff_aac_num_swb_1024[13];
extern const uint8_t ff_aac_num_swb_128[13];
extern const uint16_t * const ff_swb_offset_1024[13];
extern const uint16_t * const ff_swb_offset_128[13];
extern const uint8_t ff_tns_max_bands_1024[13];
extern const uint8_t ff_tns_max_bands_128[13];
// mpegaudiodec_common.o (globalized locals)
extern const uint8_t mpa_huff_sizes_minus_one[32];
extern const uint8_t mpa_huffsymbols[1408];
extern const int8_t mpa_hufflens[1408];
extern const uint8_t mpa_quad_bits[2][16];
extern const uint8_t mpa_quad_codes[2][16];
extern const uint8_t ff_mpa_huff_data[32][2];
extern const uint8_t ff_band_size_long[9][22];
extern const uint8_t ff_band_size_short[9][13];
extern const uint8_t ff_mpa_pretab[2][22];
extern const uint8_t ff_slen_table[2][16];
extern const uint8_t ff_lsf_nsf_table[6][3][4];
// mpegaudiotabs.o
extern const uint16_t ff_mpa_freq_tab[3];
extern const uint16_t ff_mpa_bitrate_tab[2][3][15];
// mpegaudiodsp_data.o
extern const int32_t ff_mpa_enwindow[257];
// vorbis_data.o
extern const float ff_vorbis_floor1_inverse_db_table[256];
// speexdec.o (globalized locals): NB CELP spec tables
extern const int8_t cdbk_nb[640];
extern const int8_t cdbk_nb_low1[320];
extern const int8_t cdbk_nb_low2[320];
extern const int8_t cdbk_nb_high1[320];
extern const int8_t cdbk_nb_high2[320];
extern const int8_t gain_cdbk_nb[512];
extern const int8_t gain_cdbk_lbr[128];
extern const int8_t exc_5_64_table[320];
extern const int8_t exc_5_256_table[1280];
extern const int8_t exc_8_128_table[1024];
extern const int8_t exc_10_16_table[160];
extern const int8_t exc_10_32_table[320];
extern const int8_t exc_20_32_table[640];
extern const float exc_gain_quant_scal1[2];
extern const float exc_gain_quant_scal3[8];
extern const float shift_filt[3][7];
extern const float h0[64];
extern const signed char hexc_table[1024];
extern const signed char hexc_10_32_table[320];
extern const signed char high_lsp_cdbk[512];
extern const signed char high_lsp_cdbk2[512];
extern const float gc_quant_bound[16];
extern const float e_ratio_quant[4];
extern const uint16_t wb_skip_table[8];
// ac3.o / ac3tab.o / ac3dec_data.o: A/52 spec tables
extern const uint16_t ac3_hearing_threshold_tab[50][3];
extern const uint8_t ac3_log_add_tab[260];
extern const uint8_t ff_ac3_band_start_tab[51];
extern const uint8_t ff_ac3_bin_to_band_tab[253];
extern const uint8_t ff_ac3_bap_tab[64];
extern const uint8_t ff_ac3_slow_decay_tab[4];
extern const uint8_t ff_ac3_fast_decay_tab[4];
extern const uint16_t ff_ac3_slow_gain_tab[4];
extern const uint16_t ff_ac3_fast_gain_tab[8];
extern const uint16_t ff_ac3_db_per_bit_tab[4];
extern const int16_t ff_ac3_floor_tab[8];
extern const uint16_t ff_ac3_frame_size_tab[38][3];
extern const uint16_t ff_ac3_sample_rate_tab[3];
extern const uint16_t ff_ac3_bitrate_tab[19];
extern const uint8_t ff_ac3_channels_tab[8];
extern const uint8_t ff_ac3_ungroup_3_in_5_bits_tab[32][3];

// stub the init helpers the data objects reference but the dumper
// never calls (only reachable from codec init functions)
void ff_kbd_window_init() {}
void ff_init_ff_sine_windows() {}
void ff_init_vlc_from_lengths() {}
void ff_init_vlc_sparse() {}
void ff_get_buffer() {}
}

static void dump(const char* name, const void* data, size_t bytes) {
    char path[512];
    snprintf(path, sizeof path, "%s/%s.bin", OUTDIR, name);
    FILE* f = fopen(path, "wb");
    fwrite(data, 1, bytes, f);
    fclose(f);
}

int main() {
    dump("aac_spectral_sizes", ff_aac_spectral_sizes, sizeof ff_aac_spectral_sizes);
    for (int i = 0; i < 11; ++i) {
        char n[64];
        snprintf(n, sizeof n, "aac_spectral_codes_%d", i);
        dump(n, ff_aac_spectral_codes[i], ff_aac_spectral_sizes[i] * 2);
        snprintf(n, sizeof n, "aac_spectral_bits_%d", i);
        dump(n, ff_aac_spectral_bits[i], ff_aac_spectral_sizes[i]);
    }
    dump("aac_scalefactor_code", ff_aac_scalefactor_code, sizeof ff_aac_scalefactor_code);
    dump("aac_scalefactor_bits", ff_aac_scalefactor_bits, sizeof ff_aac_scalefactor_bits);
    dump("aac_num_swb_1024", ff_aac_num_swb_1024, 13);
    dump("aac_num_swb_128", ff_aac_num_swb_128, 13);
    for (int i = 0; i < 13; ++i) {
        char n[64];
        snprintf(n, sizeof n, "aac_swb_offset_1024_%d", i);
        dump(n, ff_swb_offset_1024[i], (ff_aac_num_swb_1024[i] + 1) * 2);
        snprintf(n, sizeof n, "aac_swb_offset_128_%d", i);
        dump(n, ff_swb_offset_128[i], (ff_aac_num_swb_128[i] + 1) * 2);
    }
    dump("aac_tns_max_bands_1024", ff_tns_max_bands_1024, 13);
    dump("aac_tns_max_bands_128", ff_tns_max_bands_128, 13);

    dump("mpa_huff_sizes_minus_one", mpa_huff_sizes_minus_one, sizeof mpa_huff_sizes_minus_one);
    dump("mpa_huffsymbols", mpa_huffsymbols, sizeof mpa_huffsymbols);
    dump("mpa_hufflens", mpa_hufflens, sizeof mpa_hufflens);
    dump("mpa_quad_bits", mpa_quad_bits, sizeof mpa_quad_bits);
    dump("mpa_quad_codes", mpa_quad_codes, sizeof mpa_quad_codes);
    dump("mpa_huff_data", ff_mpa_huff_data, sizeof ff_mpa_huff_data);
    dump("mpa_band_size_long", ff_band_size_long, sizeof ff_band_size_long);
    dump("mpa_band_size_short", ff_band_size_short, sizeof ff_band_size_short);
    dump("mpa_pretab", ff_mpa_pretab, sizeof ff_mpa_pretab);
    dump("mpa_slen_table", ff_slen_table, sizeof ff_slen_table);
    dump("mpa_lsf_nsf_table", ff_lsf_nsf_table, sizeof ff_lsf_nsf_table);
    dump("mpa_freq_tab", ff_mpa_freq_tab, sizeof ff_mpa_freq_tab);
    dump("mpa_bitrate_tab", ff_mpa_bitrate_tab, sizeof ff_mpa_bitrate_tab);
    dump("mpa_enwindow", ff_mpa_enwindow, sizeof ff_mpa_enwindow);
    dump("vorbis_floor1_inverse_db", ff_vorbis_floor1_inverse_db_table,
         sizeof ff_vorbis_floor1_inverse_db_table);

    dump("spx_cdbk_nb", cdbk_nb, sizeof cdbk_nb);
    dump("spx_cdbk_nb_low1", cdbk_nb_low1, sizeof cdbk_nb_low1);
    dump("spx_cdbk_nb_low2", cdbk_nb_low2, sizeof cdbk_nb_low2);
    dump("spx_cdbk_nb_high1", cdbk_nb_high1, sizeof cdbk_nb_high1);
    dump("spx_cdbk_nb_high2", cdbk_nb_high2, sizeof cdbk_nb_high2);
    dump("spx_gain_cdbk_nb", gain_cdbk_nb, sizeof gain_cdbk_nb);
    dump("spx_gain_cdbk_lbr", gain_cdbk_lbr, sizeof gain_cdbk_lbr);
    dump("spx_exc_5_64", exc_5_64_table, sizeof exc_5_64_table);
    dump("spx_exc_5_256", exc_5_256_table, sizeof exc_5_256_table);
    dump("spx_exc_8_128", exc_8_128_table, sizeof exc_8_128_table);
    dump("spx_exc_10_16", exc_10_16_table, sizeof exc_10_16_table);
    dump("spx_exc_10_32", exc_10_32_table, sizeof exc_10_32_table);
    dump("spx_exc_20_32", exc_20_32_table, sizeof exc_20_32_table);
    dump("spx_exc_gain_scal1", exc_gain_quant_scal1, sizeof exc_gain_quant_scal1);
    dump("spx_exc_gain_scal3", exc_gain_quant_scal3, sizeof exc_gain_quant_scal3);
    dump("spx_shift_filt", shift_filt, sizeof shift_filt);
    dump("spx_h0", h0, sizeof h0);
    dump("spx_hexc_table", hexc_table, sizeof hexc_table);
    dump("spx_hexc_10_32", hexc_10_32_table, sizeof hexc_10_32_table);
    dump("spx_high_lsp_cdbk", high_lsp_cdbk, sizeof high_lsp_cdbk);
    dump("spx_high_lsp_cdbk2", high_lsp_cdbk2, sizeof high_lsp_cdbk2);
    dump("spx_gc_quant_bound", gc_quant_bound, sizeof gc_quant_bound);
    dump("spx_e_ratio_quant", e_ratio_quant, sizeof e_ratio_quant);
    dump("spx_wb_skip_table", wb_skip_table, sizeof wb_skip_table);
    dump("ac3_hth", ac3_hearing_threshold_tab, sizeof ac3_hearing_threshold_tab);
    dump("ac3_log_add", ac3_log_add_tab, sizeof ac3_log_add_tab);
    dump("ac3_band_start", ff_ac3_band_start_tab, sizeof ff_ac3_band_start_tab);
    dump("ac3_bin_to_band", ff_ac3_bin_to_band_tab, sizeof ff_ac3_bin_to_band_tab);
    dump("ac3_bap_tab", ff_ac3_bap_tab, sizeof ff_ac3_bap_tab);
    dump("ac3_slow_decay", ff_ac3_slow_decay_tab, sizeof ff_ac3_slow_decay_tab);
    dump("ac3_fast_decay", ff_ac3_fast_decay_tab, sizeof ff_ac3_fast_decay_tab);
    dump("ac3_slow_gain", ff_ac3_slow_gain_tab, sizeof ff_ac3_slow_gain_tab);
    dump("ac3_fast_gain", ff_ac3_fast_gain_tab, sizeof ff_ac3_fast_gain_tab);
    dump("ac3_db_per_bit", ff_ac3_db_per_bit_tab, sizeof ff_ac3_db_per_bit_tab);
    dump("ac3_floor", ff_ac3_floor_tab, sizeof ff_ac3_floor_tab);
    dump("ac3_frame_size", ff_ac3_frame_size_tab, sizeof ff_ac3_frame_size_tab);
    dump("ac3_sample_rate", ff_ac3_sample_rate_tab, sizeof ff_ac3_sample_rate_tab);
    dump("ac3_bitrate", ff_ac3_bitrate_tab, sizeof ff_ac3_bitrate_tab);
    dump("ac3_channels", ff_ac3_channels_tab, sizeof ff_ac3_channels_tab);
    dump("ac3_ungroup35", ff_ac3_ungroup_3_in_5_bits_tab, sizeof ff_ac3_ungroup_3_in_5_bits_tab);
    printf("ok\n");
    return 0;
}
"""

MP3_LOCALS = [
    "mpa_huff_sizes_minus_one",
    "mpa_huffsymbols",
    "mpa_hufflens",
    "mpa_quad_bits",
    "mpa_quad_codes",
]

SPEEX_LOCALS = [
    "cdbk_nb", "cdbk_nb_low1", "cdbk_nb_low2", "cdbk_nb_high1",
    "cdbk_nb_high2", "gain_cdbk_nb", "gain_cdbk_lbr",
    "exc_5_64_table", "exc_5_256_table", "exc_8_128_table",
    "exc_10_16_table", "exc_10_32_table", "exc_20_32_table",
    "exc_gain_quant_scal1", "exc_gain_quant_scal3",
    # enhancer + wideband (round-3): fractional-shift filters, QMF
    # synthesis filter, SB high-band codebooks and gain bounds
    "shift_filt", "h0", "hexc_table", "hexc_10_32_table",
    "high_lsp_cdbk", "high_lsp_cdbk2", "gc_quant_bound",
    "e_ratio_quant", "wb_skip_table",
]


def extract() -> None:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        tdp = Path(td)
        subprocess.run(
            ["ar", "x", ARCHIVE, "aactab.o", "mpegaudiodec_common.o",
             "mpegaudiodata.o", "mpegaudiodsp_data.o", "mpegaudiotabs.o",
             "vorbis_data.o", "speexdec.o", "ac3.o", "ac3tab.o",
             "ac3dec_data.o"],
            cwd=td, check=True,
        )
        globalize = []
        for sym in MP3_LOCALS:
            globalize += ["--globalize-symbol", sym]
        subprocess.run(
            ["objcopy", *globalize, "mpegaudiodec_common.o", "mpegaudiodec_tables.o"],
            cwd=td, check=True,
        )
        spx_globalize = []
        for sym in SPEEX_LOCALS:
            spx_globalize += ["--globalize-symbol", sym]
        subprocess.run(
            ["objcopy", "--globalize-symbol", "ac3_hearing_threshold_tab",
             "--globalize-symbol", "ac3_log_add_tab",
             "ac3.o", "ac3_tables.o"],
            cwd=td, check=True,
        )
        # keep only the data: strip function symbols so the dumper
        # never links decoder code
        subprocess.run(
            ["objcopy", *spx_globalize,
             "--keep-section=.rodata", "--keep-section=.rodata.cst4",
             "--keep-section=.symtab",
             "speexdec.o", "speex_tables.o"],
            cwd=td, check=True,
        )
        # localize everything we don't need to avoid dragging in deps:
        # compile dumper with the data objects; undefined refs in the
        # objects (init functions) are unused and dropped by the linker
        # only if we use --gc-sections; instead allow unresolved.
        dumper = tdp / "dumper.cpp"
        dumper.write_text(DUMPER)
        subprocess.run(
            ["g++", "-O1", f"-DOUTDIR=\"{td}\"", "dumper.cpp",
             "aactab.o", "mpegaudiodec_tables.o", "mpegaudiodata.o",
             "mpegaudiodsp_data.o", "mpegaudiotabs.o", "vorbis_data.o",
             "speex_tables.o", "ac3_tables.o", "ac3tab.o", "ac3dec_data.o",
             # remaining stray refs (av_log etc.) resolve against the
             # shared libs; init helpers are stubbed in the dumper
             "-lavutil", "-lm", "-lpthread",
             "-o", "dumper"],
            cwd=td, check=True,
        )
        subprocess.run(["./dumper"], cwd=td, check=True)

        def load(name, dtype):
            return np.frombuffer((tdp / f"{name}.bin").read_bytes(), dtype=dtype)

        aac = {}
        sizes = load("aac_spectral_sizes", "<u2")
        aac["spectral_sizes"] = sizes
        for i in range(11):
            aac[f"spectral_codes_{i}"] = load(f"aac_spectral_codes_{i}", "<u2")
            aac[f"spectral_bits_{i}"] = load(f"aac_spectral_bits_{i}", "u1")
        aac["scalefactor_code"] = load("aac_scalefactor_code", "<u4")
        aac["scalefactor_bits"] = load("aac_scalefactor_bits", "u1")
        aac["num_swb_1024"] = load("aac_num_swb_1024", "u1")
        aac["num_swb_128"] = load("aac_num_swb_128", "u1")
        for i in range(13):
            aac[f"swb_offset_1024_{i}"] = load(f"aac_swb_offset_1024_{i}", "<u2")
            aac[f"swb_offset_128_{i}"] = load(f"aac_swb_offset_128_{i}", "<u2")
        aac["tns_max_bands_1024"] = load("aac_tns_max_bands_1024", "u1")
        aac["tns_max_bands_128"] = load("aac_tns_max_bands_128", "u1")
        np.savez(OUT_DIR / "aac_tables.npz", **aac)

        mp3 = {
            "huff_sizes_minus_one": load("mpa_huff_sizes_minus_one", "u1"),
            "huffsymbols": load("mpa_huffsymbols", "u1"),
            "hufflens": load("mpa_hufflens", "i1"),
            "quad_bits": load("mpa_quad_bits", "u1").reshape(2, 16),
            "quad_codes": load("mpa_quad_codes", "u1").reshape(2, 16),
            "huff_data": load("mpa_huff_data", "u1").reshape(32, 2),
            "band_size_long": load("mpa_band_size_long", "u1").reshape(9, 22),
            "band_size_short": load("mpa_band_size_short", "u1").reshape(9, 13),
            "pretab": load("mpa_pretab", "u1").reshape(2, 22),
            "slen_table": load("mpa_slen_table", "u1").reshape(2, 16),
            "lsf_nsf_table": load("mpa_lsf_nsf_table", "u1").reshape(6, 3, 4),
            "freq_tab": load("mpa_freq_tab", "<u2"),
            "bitrate_tab": load("mpa_bitrate_tab", "<u2").reshape(2, 3, 15),
            "enwindow": load("mpa_enwindow", "<i4"),
        }
        np.savez(OUT_DIR / "mp3_tables.npz", **mp3)

        vorbis = {
            "floor1_inverse_db": load("vorbis_floor1_inverse_db", "<f4"),
        }
        np.savez(OUT_DIR / "vorbis_tables.npz", **vorbis)

        spx = {
            "cdbk_nb": load("spx_cdbk_nb", "i1").reshape(64, 10),
            "cdbk_nb_low1": load("spx_cdbk_nb_low1", "i1").reshape(64, 5),
            "cdbk_nb_low2": load("spx_cdbk_nb_low2", "i1").reshape(64, 5),
            "cdbk_nb_high1": load("spx_cdbk_nb_high1", "i1").reshape(64, 5),
            "cdbk_nb_high2": load("spx_cdbk_nb_high2", "i1").reshape(64, 5),
            "gain_cdbk_nb": load("spx_gain_cdbk_nb", "i1").reshape(128, 4),
            "gain_cdbk_lbr": load("spx_gain_cdbk_lbr", "i1").reshape(32, 4),
            "exc_5_64": load("spx_exc_5_64", "i1").reshape(64, 5),
            "exc_5_256": load("spx_exc_5_256", "i1").reshape(256, 5),
            "exc_8_128": load("spx_exc_8_128", "i1").reshape(128, 8),
            "exc_10_16": load("spx_exc_10_16", "i1").reshape(16, 10),
            "exc_10_32": load("spx_exc_10_32", "i1").reshape(32, 10),
            "exc_20_32": load("spx_exc_20_32", "i1").reshape(32, 20),
            "exc_gain_scal1": load("spx_exc_gain_scal1", "<f4"),
            "exc_gain_scal3": load("spx_exc_gain_scal3", "<f4"),
            "shift_filt": load("spx_shift_filt", "<f4").reshape(3, 7),
            "h0": load("spx_h0", "<f4"),
            "hexc_table": load("spx_hexc_table", "i1").reshape(128, 8),
            "hexc_10_32": load("spx_hexc_10_32", "i1").reshape(32, 10),
            "high_lsp_cdbk": load("spx_high_lsp_cdbk", "i1").reshape(64, 8),
            "high_lsp_cdbk2": load("spx_high_lsp_cdbk2", "i1").reshape(64, 8),
            "gc_quant_bound": load("spx_gc_quant_bound", "<f4"),
            "e_ratio_quant": load("spx_e_ratio_quant", "<f4"),
            "wb_skip_table": load("spx_wb_skip_table", "<u2"),
        }
        np.savez(OUT_DIR / "speex_tables.npz", **spx)

        ac3 = {
            "hth": load("ac3_hth", "<u2").reshape(50, 3),
            "log_add": load("ac3_log_add", "u1"),
            "band_start": load("ac3_band_start", "u1"),
            "bin_to_band": load("ac3_bin_to_band", "u1"),
            "bap_tab": load("ac3_bap_tab", "u1"),
            "slow_decay": load("ac3_slow_decay", "u1"),
            "fast_decay": load("ac3_fast_decay", "u1"),
            "slow_gain": load("ac3_slow_gain", "<u2"),
            "fast_gain": load("ac3_fast_gain", "<u2"),
            "db_per_bit": load("ac3_db_per_bit", "<u2"),
            "floor": load("ac3_floor", "<i2"),
            "frame_size": load("ac3_frame_size", "<u2").reshape(38, 3),
            "sample_rate": load("ac3_sample_rate", "<u2"),
            "bitrate": load("ac3_bitrate", "<u2"),
            "channels": load("ac3_channels", "u1"),
            "ungroup35": load("ac3_ungroup35", "u1").reshape(32, 3),
        }
        np.savez(OUT_DIR / "ac3_tables.npz", **ac3)
    print(f"wrote {OUT_DIR}/aac_tables.npz, mp3_tables.npz, vorbis_tables.npz, speex_tables.npz, ac3_tables.npz")


def extract_opus() -> None:
    """Slice every RFC 6716 data table out of opustab.o by symbol.

    Unlike the other codecs this needs no dumper binary: all Opus
    tables live in one object's .rodata, so the ELF symbol table gives
    (offset, size) for each and the bytes are stored RAW (uint8); the
    decoder reinterprets dtype/shape at load (codecs/opus_tables.py).
    Pointer-valued symbols (ff_celt_window, ff_celt_pvq_u_row) are
    reconstructed there from their backing arrays.
    """
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        subprocess.run(["ar", "x", ARCHIVE, "opustab.o"], cwd=td, check=True)
        obj = td / "opustab.o"
        subprocess.run(
            ["objcopy", "-O", "binary", "--only-section=.rodata",
             str(obj), str(td / "rodata.bin")],
            check=True,
        )
        blob = (td / "rodata.bin").read_bytes()
        out = {}
        dump = subprocess.run(
            ["objdump", "-t", str(obj)], capture_output=True, text=True,
            check=True,
        ).stdout
        for line in dump.splitlines():
            parts = line.split()
            if len(parts) < 6 or parts[3] != ".rodata":
                continue
            off = int(parts[0], 16)
            size = int(parts[4], 16)
            name = parts[5]
            if size == 0 or not (
                name.startswith("ff_celt_")
                or name.startswith("ff_silk_")
                or name.startswith("ff_opus_")
                or name == "celt_pvq_u"
            ):
                continue
            out[name] = np.frombuffer(blob[off : off + size], dtype=np.uint8)
        assert "celt_pvq_u" in out and "ff_silk_lsf_codebook_wb" in out
        np.savez(OUT_DIR / "opus_tables.npz", **out)
        print(f"wrote {OUT_DIR}/opus_tables.npz ({len(out)} tables)")


if __name__ == "__main__":
    extract()
    extract_opus()
