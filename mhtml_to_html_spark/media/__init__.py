from .codecs import (  # noqa: F401
    decode_wav,
    decode_y4m,
    encode_wav,
    encode_y4m,
    synth_audio,
    synth_video,
)
from .apng import decode_apng, encode_apng  # noqa: F401
from .gif import decode_gif, encode_gif  # noqa: F401
from .jpeg import (  # noqa: F401
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_cmyk,
    encode_jpeg_multiscan,
    encode_jpeg_progressive,
)
from .png import decode_png, encode_png  # noqa: F401
from .ico import decode_ico, encode_ico  # noqa: F401
from .probe import probe_audio, probe_image, probe_video  # noqa: F401
