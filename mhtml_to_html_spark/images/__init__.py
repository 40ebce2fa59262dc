from .synth import (  # noqa: F401
    synth_image,
    encode_ppm,
    decode_ppm,
    encode_bmp,
    decode_bmp,
    encode_image,
    decode_image,
    quantize_lossy,
    psnr,
    phash64,
    caption_for,
)
