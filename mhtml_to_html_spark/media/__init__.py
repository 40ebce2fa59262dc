from .codecs import (  # noqa: F401
    decode_wav,
    decode_y4m,
    encode_wav,
    encode_y4m,
    synth_audio,
    synth_video,
)
