"""r3 item 5: paged decode across page sizes after the G-pages-per-step
rewrite (target: paged <= 1.05x contiguous for bf16/int8/fp8 at page 256
and 512; prior cliff: int8 page=256 at 0.454 of roofline).

Also correctness: paged vs contiguous decode on the same cache content.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import chain_step_seconds, roundtrip_seconds
from flash_attn_tpu.ops.decode import flash_decode
from flash_attn_tpu.ops.paged_decode import paged_flash_decode

HBM_GBS = 819.0  # v5e


def build(mode, page, B, Hk, H, S, D):
    """Pool laid out so page p of seq b = contiguous rows [p*page,(p+1)*page)."""
    rng = np.random.default_rng(0)
    kf = rng.standard_normal((B, Hk, S, D), np.float32)
    vf = rng.standard_normal((B, Hk, S, D), np.float32)
    if mode == "bf16":
        store = jnp.bfloat16
        kq = jnp.asarray(kf, store)
        vq = jnp.asarray(vf, store)
        ks = vs = None
    else:
        from flash_attn_tpu.ops.quant import quantize_kv

        kq_, ks_, vq_, vs_ = quantize_kv(
            jnp.swapaxes(jnp.asarray(kf), 1, 2),
            jnp.swapaxes(jnp.asarray(vf), 1, 2),
            "int8" if mode == "int8" else "fp8",
        )  # [B, S, Hk, *]
        kq = jnp.swapaxes(kq_, 1, 2)
        vq = jnp.swapaxes(vq_, 1, 2)
        ks = jnp.swapaxes(jnp.swapaxes(ks_, 1, 2), 2, 3)  # [B, Hk, 1, S]
        vs = jnp.swapaxes(jnp.swapaxes(vs_, 1, 2), 2, 3)
    n_per = S // page
    num_pages = 1 + B * n_per
    kp = jnp.zeros((num_pages, Hk, page, D), kq.dtype)
    vp = jnp.zeros((num_pages, Hk, page, D), kq.dtype)
    kp = kp.at[1:].set(
        jnp.swapaxes(kq.reshape(B, Hk, n_per, page, D), 1, 2).reshape(
            B * n_per, Hk, page, D
        )
    )
    vp = vp.at[1:].set(
        jnp.swapaxes(vq.reshape(B, Hk, n_per, page, D), 1, 2).reshape(
            B * n_per, Hk, page, D
        )
    )
    ksp = vsp = None
    if ks is not None:
        def pagesc(s):  # [B, Hk, 1, S] -> [num_pages, Hk, 1, page]
            r = jnp.swapaxes(
                s.reshape(B, Hk, 1, n_per, page), 1, 3
            )  # [B, n_per, 1, Hk, page]
            r = jnp.swapaxes(r, 2, 3).reshape(B * n_per, Hk, 1, page)
            buf = jnp.ones((num_pages, Hk, 1, page), jnp.float32)
            return buf.at[1:].set(r)

        ksp = pagesc(ks)
        vsp = pagesc(vs)
    tbl = jnp.asarray(
        1 + np.arange(B * n_per, dtype=np.int32).reshape(B, n_per)
    )
    return (kq, vq, ks, vs), (kp, vp, ksp, vsp, tbl)


if __name__ == "__main__":
    B, Hk, H, S, D = 8, 8, 32, 8192, 128
    q = jax.random.normal(jax.random.PRNGKey(1), (B, H, D), jnp.bfloat16)
    lens = jnp.full((B,), S - 100, jnp.int32)
    rt = roundtrip_seconds()
    for mode in ("bf16", "int8", "fp8"):
        contig, _ = build(mode, 512, B, Hk, H, S, D)
        kq, vq, ks, vs = contig
        itemsize = kq.dtype.itemsize
        ideal = 2 * B * Hk * (S - 100) * D * itemsize / (HBM_GBS * 1e9)
        want = flash_decode(
            q, kq, vq, kv_length=lens, k_scale=ks, v_scale=vs,
            kv_layout="bhsd",
            scale_layout="lanes" if ks is not None else "kv",
        )
        step_c = lambda q_, *cs: flash_decode(
            q_ * 0 + q, cs[0], cs[1], kv_length=lens,
            k_scale=cs[2] if ks is not None else None,
            v_scale=cs[3] if ks is not None else None,
            kv_layout="bhsd",
            scale_layout="lanes" if ks is not None else "kv",
        )
        consts = (kq, vq) + ((ks, vs) if ks is not None else ())
        t_c, _ = chain_step_seconds(step_c, q, consts, n=8, rt=rt,
                                    floor_s=ideal / 1.3)
        print(f"{mode} contiguous: {t_c*1e6:.1f} us  "
              f"{ideal/t_c:.4f} of roofline", flush=True)
        for page in (256, 512):
            _, paged = build(mode, page, B, Hk, H, S, D)
            kp, vp, ksp, vsp, tbl = paged
            got = paged_flash_decode(
                q, kp, vp, tbl, lens, k_scale=ksp, v_scale=vsp,
                scales_permuted=False,
            )
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - want.astype(jnp.float32)
            )))
            step_p = lambda q_, *cs: paged_flash_decode(
                q_ * 0 + q, cs[0], cs[1], cs[2], lens,
                k_scale=cs[3] if ksp is not None else None,
                v_scale=cs[4] if ksp is not None else None,
                scales_permuted=False,
            )
            pconsts = (kp, vp, tbl) + ((ksp, vsp) if ksp is not None else ())
            t_p, _ = chain_step_seconds(step_p, q, pconsts, n=8, rt=rt,
                                        floor_s=ideal / 1.3)
            print(f"{mode} paged page={page}: {t_p*1e6:.1f} us  "
                  f"{ideal/t_p:.4f} of roofline  vs contig "
                  f"{t_p/t_c:.3f}x  maxerr {err:.2e}", flush=True)
