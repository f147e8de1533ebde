"""Real-TPU verify drive (.claude/skills/verify): exercises every hot kernel
family through the package boundary on the real chip — the run that catches
Mosaic lowering bugs interpret mode can't.

Run:  PYTHONPATH=/root/repo python tools/drive_verify.py
(ambient axon env; takes several minutes of remote kernel compiles)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")


def check(name, got, want, atol, rtol=None):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = float(np.max(np.abs(got - want)))
    ok = err <= atol + (0 if rtol is None else rtol * float(np.max(np.abs(want))))
    print(f"{'PASS' if ok else 'FAIL'} {name}: maxerr {err:.3e}")
    return ok


def main():
    import os

    dev = jax.devices()[0]
    print("device:", dev, dev.platform)
    if not os.environ.get("DRIVE_SMOKE"):
        assert dev.platform == "tpu", "drive requires the real chip"

    from flash_attn_tpu import flash_attention, flash_attention_varlen
    from flash_attn_tpu.ops.decode import flash_decode
    from flash_attn_tpu.ops.reference import mha_reference
    from flash_attn_tpu.ops.rope import rope_cos_sin, rope_rotate
    from flash_attn_tpu.ops.quant import quantize_kv

    ok = True
    key = jax.random.PRNGKey(0)
    B, S, H, Hk, D = 2, 1024, 8, 4, 128
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, S, Hk, D), jnp.float32)
    v = jax.random.normal(kv, (B, S, Hk, D), jnp.float32)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    # 1. dense causal GQA bf16 fwd (jit)
    out = jax.jit(lambda *a: flash_attention(*a, causal=True))(qb, kb, vb)
    want = mha_reference(q, k, v, causal=True)
    ok &= check("fa2 fwd causal gqa bf16", out, want, 2e-2)

    # 2. in-kernel rope fwd (vs outside rotation)
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    cos, sin = rope_cos_sin(pos, D, 10000.0)
    k_rot = rope_rotate(kb, cos, sin)
    out_r = jax.jit(
        lambda q_, k_, v_: flash_attention(
            q_, k_, v_, causal=True, rope_cos=cos, rope_sin=sin
        )
    )(qb, k_rot, vb)
    want_r = mha_reference(
        rope_rotate(q, cos, sin), rope_rotate(k, cos, sin), v, causal=True
    )
    ok &= check("fa2 fwd in-kernel rope", out_r, want_r, 3e-2)

    # 2b. logit softcap (Gemma-2 style) fwd.  The x3 amplification makes
    # the softmax winner-take-all peaky, so input-rounding alone moves the
    # fp32 oracle by ~0.06 here — compare against the oracle fed the SAME
    # bf16-rounded inputs the kernel saw (isolates kernel error; measured
    # 0.0308 on chip = 0.0309 interpret, i.e. Mosaic-exact).
    out_c = jax.jit(
        lambda *a: flash_attention(*a, causal=True, logit_softcap=20.0)
    )(qb * 3, kb * 3, vb)
    want_c = mha_reference(
        (qb * 3).astype(jnp.float32), (kb * 3).astype(jnp.float32),
        vb.astype(jnp.float32), causal=True, logit_softcap=20.0,
    )
    ok &= check("fa2 fwd logit softcap", out_c, want_c, 4e-2)

    # 3. grad through the Pallas backward (with rope)
    def loss(q_, k_, v_):
        o = flash_attention(
            q_, rope_rotate(k_, cos, sin), v_, causal=True,
            rope_cos=cos, rope_sin=sin,
        )
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q_, k_, v_):
        o = mha_reference(
            rope_rotate(q_, cos, sin), rope_rotate(k_, cos, sin), v_,
            causal=True,
        )
        return jnp.sum(o ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qb, kb, vb)
    gw = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), g, gw):
        ok &= check(f"fa2 bwd rope {name}", a, b, 3.0, rtol=2e-2)

    # 4. varlen with cu_seqlens
    cu = jnp.asarray([0, 300, 1024], jnp.int32)
    qp = qb.reshape(1, B * S, H, D)[0][: 1024 + 0]
    kp, vp = kb.reshape(-1, Hk, D)[:1024], vb.reshape(-1, Hk, D)[:1024]
    ov = jax.jit(
        lambda a, b, c: flash_attention_varlen(a, b, c, cu, cu, causal=True)
    )(qp[:1024], kp, vp)
    # oracle: two independent causal segments
    o1 = mha_reference(
        qp[None, :300].astype(jnp.float32), kp[None, :300].astype(jnp.float32),
        vp[None, :300].astype(jnp.float32), causal=True,
    )[0]
    o2 = mha_reference(
        qp[None, 300:1024].astype(jnp.float32),
        kp[None, 300:1024].astype(jnp.float32),
        vp[None, 300:1024].astype(jnp.float32), causal=True,
    )[0]
    ok &= check("varlen fwd", ov, jnp.concatenate([o1, o2], 0), 2e-2)

    # 5. decode with int8 / fp8 KV (contiguous, BHSD path) vs float oracle
    qd = jax.random.normal(jax.random.PRNGKey(7), (B, H, D), jnp.bfloat16)
    lens = jnp.asarray([900, 1024], jnp.int32)
    for mode in ("int8", "fp8"):
        kqz, ksc, vqz, vsc = quantize_kv(kb, vb, mode)
        od = jax.jit(
            lambda q_, a, b, s1, s2: flash_decode(
                q_, a, b, k_scale=s1, v_scale=s2, kv_length=lens
            )
        )(qd, kqz, vqz, ksc, vsc)
        kf = kqz.astype(jnp.float32) * ksc
        vf = vqz.astype(jnp.float32) * vsc
        mask = (jnp.arange(S)[None] < lens[:, None])[:, None, None, :]
        wantd = mha_reference(
            qd[:, None].astype(jnp.float32), kf, vf,
            mask=jnp.where(mask, 0.0, -jnp.inf),
        )[:, 0]
        ok &= check(f"decode {mode} kv", od, wantd, 4e-2)

    # 6. paged decode, packed fp8 pages
    from flash_attn_tpu.engine.paged import PagedKVPool, paged_decode_attention

    page, per_seq = 128, S // 128
    pool = PagedKVPool.create(
        1, B * per_seq + 1, page, B, per_seq, Hk, D,
        dtype=jnp.bfloat16, mode="fp8",
    )
    for b in range(B):
        pool = pool.assign_pages(
            b, list(range(1 + b * per_seq, 1 + (b + 1) * per_seq))
        )
        pool = pool.append_prefill(0, b, kb[b], vb[b], 0)
    pool = pool.set_lengths(list(np.asarray(lens)))
    op = jax.jit(
        lambda q_, p_: paged_decode_attention(p_, 0, q_)
    )(qd, pool)
    kqz, ksc, vqz, vsc = quantize_kv(kb, vb, "fp8")
    kf = kqz.astype(jnp.float32) * ksc
    vf = vqz.astype(jnp.float32) * vsc
    mask = (jnp.arange(S)[None] < lens[:, None])[:, None, None, :]
    wantp = mha_reference(
        qd[:, None].astype(jnp.float32), kf, vf,
        mask=jnp.where(mask, 0.0, -jnp.inf),
    )[:, 0]
    ok &= check("paged decode packed fp8", op, wantp, 4e-2)

    # 6b. quantized decode matmuls: int4 planes + w4a8 vs dequant oracle
    from flash_attn_tpu.ops.matmul import (
        W4A8Weight, matmul_int4, matmul_w4a8, quantize_activations,
    )
    from flash_attn_tpu.ops.quant import dequantize_int4, quantize_int4

    xq8 = jax.random.normal(jax.random.PRNGKey(7), (8, 1024)).astype(
        jnp.bfloat16
    )
    wq8 = jax.random.normal(jax.random.PRNGKey(8), (1024, 2048),
                            jnp.float32) * 0.02
    q4p = quantize_int4(wq8, group_size=128)  # planes (also runs the probe)
    q4h = quantize_int4(wq8, group_size=128, layout="halves")
    w48 = W4A8Weight(q4h.packed, q4h.scales, q4h.group_size, q4h.shape)
    want_i4 = jnp.dot(xq8.astype(jnp.float32), dequantize_int4(q4p))
    got_i4 = jax.jit(lambda x_: matmul_int4(x_, q4p, out_dtype=jnp.float32))(
        xq8
    )
    ok &= check("int4 planes matmul", got_i4, want_i4, 1e-2,
                rtol=1e-2)
    xa, sa = quantize_activations(xq8)
    want_48 = (xa.astype(jnp.float32) @ dequantize_int4(q4h)) * sa
    got_48 = jax.jit(lambda x_: matmul_w4a8(x_, w48, out_dtype=jnp.float32))(
        xq8
    )
    ok &= check("w4a8 s8-MXU matmul", got_48, want_48, 1e-3, rtol=1e-3)

    # 7. error surface: bad shapes raise clean ValueErrors
    try:
        flash_attention(qb[:, :, :, :64], kb, vb)
        print("FAIL error-surface: mismatched D accepted")
        ok = False
    except ValueError as e:
        print("PASS error-surface:", str(e)[:60])

    print("DRIVE", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
