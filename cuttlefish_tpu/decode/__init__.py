"""Reference block decoders (host-side numpy).

Bit-exact decoders per the public format specs, used by the test suite to
verify encoder bitstreams (SURVEY.md §4 "bit-exact decode parity") and by the
bench harness to score PSNR.  These are NOT on the encode hot path.
"""

from cuttlefish_tpu.decode.s3tc import (  # noqa: F401
    decode_bc1,
    decode_bc2,
    decode_bc3,
    decode_bc4,
    decode_bc5,
)
from cuttlefish_tpu.decode.bc6h import decode_bc6h, decode_bc6h_f32  # noqa: F401
from cuttlefish_tpu.decode.bc7 import decode_bc7  # noqa: F401
from cuttlefish_tpu.decode.astc import decode_astc  # noqa: F401
from cuttlefish_tpu.decode.etc import (  # noqa: F401
    decode_eac_alpha,
    decode_eac_r11,
    decode_eac_rg11,
    decode_etc2_a1,
    decode_etc2_rgba,
    decode_etc_rgb,
)
from cuttlefish_tpu.decode.pvrtc import decode_pvrtc1, decode_pvrtc2  # noqa: F401
