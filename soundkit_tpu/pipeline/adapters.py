"""Late-bound adapter factories for codecs still under construction.

The autodetect pipeline (decode_pipeline._init_decoder) imports these
lazily so that formats land incrementally; an unimplemented codec
raises UnsupportedFormat with a clear message rather than failing
detection.
"""
from __future__ import annotations

from soundkit_tpu.pipeline.output_options import UnsupportedFormat


def make_mp3_adapter():
    try:
        from soundkit_tpu.codecs.mp3 import Mp3Adapter
    except ImportError:
        raise UnsupportedFormat("MP3 decoder not yet available")
    return Mp3Adapter()


def make_aac_adts_adapter():
    try:
        from soundkit_tpu.codecs.aac import AacAdtsAdapter
    except ImportError:
        raise UnsupportedFormat("AAC decoder not yet available")
    return AacAdtsAdapter()


def make_ac3_adapter():
    try:
        from soundkit_tpu.codecs.telephony import make_ac3_adapter as mk
    except ImportError:
        raise UnsupportedFormat("AC-3 decoder not yet available")
    return mk()
