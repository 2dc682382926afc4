from soundkit_tpu.core.audio_types import (  # noqa: F401
    AudioData,
    EncodingFlag,
    Endianness,
    PcmData,
)
