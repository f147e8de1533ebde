"""ALiBi (attention with linear biases) slope table.

The standard head-slope schedule from the ALiBi paper (and upstream
flash-attention's ``alibi_slopes`` convention): for ``n`` a power of two,
slope_i = 2^(-8 (i+1) / n); other head counts interleave the schedule of
the next power of two.  The bias applied in-kernel is
``-slope_h * |i + seqlen_k - seqlen_q - j|`` (bottom-right aligned), the
upstream semantic for both causal and non-causal attention.
"""

from __future__ import annotations

import numpy as np


def alibi_slopes(num_heads: int) -> np.ndarray:
    """[num_heads] fp32 slopes (BLOOM/MPT schedule)."""

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(np.log2(n) - 3)))
        return start * (start ** np.arange(n))

    if np.log2(num_heads).is_integer():
        s = pow2_slopes(num_heads)
    else:
        closest = 2 ** int(np.floor(np.log2(num_heads)))
        extra = pow2_slopes(2 * closest)[0::2][: num_heads - closest]
        s = np.concatenate([pow2_slopes(closest), extra])
    return s.astype(np.float32)
