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
