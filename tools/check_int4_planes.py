#!/usr/bin/env python
"""On-chip parity check for the INT4 'planes' packing (advisor round-4,
medium): the planes kernel's whole-i32-word nibble decode depends on
pltpu.bitcast's uint8->int32 byte/sublane order and int32->bf16 half order
matching quant._plane_row_sources — an ordering CPU CI cannot observe
(the interpret branch decodes with plain jnp).

Run on real hardware via:  python tools/run_on_tpu.py tools/check_int4_planes.py

Checks, at a production-like shape, that
  matmul_int4(planes) == matmul_int4(halves) == x @ dequantize_int4(w)
and that the library's own first-use probe (ops.matmul._probe_planes_decode)
passes.  Exits non-zero on mismatch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from flash_attn_tpu.ops import matmul as mm
    from flash_attn_tpu.ops.quant import dequantize_int4, quantize_int4

    print("backend:", jax.default_backend(), jax.devices())
    on_cpu = jax.default_backend() == "cpu"

    # The library's own guard (raises on mismatch).
    if not on_cpu:
        mm._PLANES_PROBE_OK = False
        mm._probe_planes_decode()
        print("library first-use probe: ok")

    M, K, N, g = 8, 4096, 2048, 128
    wf = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K)).astype(jnp.bfloat16)
    wp = quantize_int4(wf, group_size=g, layout="planes")
    wh = quantize_int4(wf, group_size=g, layout="halves")

    got_p = mm.matmul_int4(x, wp, out_dtype=jnp.float32, interpret=on_cpu)
    got_h = mm.matmul_int4(x, wh, out_dtype=jnp.float32, interpret=on_cpu)
    want = jnp.dot(x.astype(jnp.float32), dequantize_int4(wp),
                   preferred_element_type=jnp.float32)

    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    err_p = float(jnp.max(jnp.abs(got_p - want))) / scale
    err_h = float(jnp.max(jnp.abs(got_h - want))) / scale
    err_ph = float(jnp.max(jnp.abs(got_p - got_h))) / scale
    print(f"rel err planes-vs-oracle {err_p:.3e}  halves-vs-oracle "
          f"{err_h:.3e}  planes-vs-halves {err_ph:.3e}")
    ok = err_p < 1e-2 and err_h < 1e-2 and err_ph < 1e-2
    print("PLANES_CHECK", "ok" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
