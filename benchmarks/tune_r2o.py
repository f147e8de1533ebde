"""Round-2o: where does the FA2-forward non-causal ceiling (0.691) come
from?  Self-contained probe kernels isolate the softmax VPU cost:

  A  baseline       — online softmax, f32 stats (== lib kernel, noncausal)
  B  stats-free     — p = exp(s), no max/sum/rescale (WRONG math; perf
                      ceiling if softmax stats were free)
  C  bf16-softmax   — subtract/exp/max/sum all in bf16 (half the VPU
                      passes; stats upcast to f32 for the running update)
  D  no-sum         — max kept in f32, l accumulated as sum of the PV
                      GEMM's row... (skipped: needs MXU augmentation)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tune_r2o.py
"""

import functools
import time

import numpy as np


def paired(fn_n, fn_2n, n, iters=5):
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); fn_n(); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fn_2n(); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, H, Hk, D = 1, 8192, 32, 8, 128
    BQ = BK = 1024
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, D), jnp.bfloat16)
    flops = 4 * B * H * S * S * D  # noncausal
    group = H // Hk
    nq, nk = S // BQ, S // BK
    LANES = 128

    def sdot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dims, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    def kern(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc, *, variant):
        ki = pl.program_id(3)

        @pl.when(ki == 0)
        def _():
            m_s[...] = jnp.full_like(m_s, -1e30)
            l_s[...] = jnp.zeros_like(l_s)
            acc[...] = jnp.zeros_like(acc)

        qb = q_ref[0, 0]
        kb = k_ref[0, 0]
        s = sdot(qb, kb, (((1,), (1,)), ((), ())))  # [BQ, BK] f32

        if variant == "B":  # stats-free ceiling (wrong math)
            p = jnp.exp(s * 0.0883883)
            acc[...] += sdot(p.astype(jnp.bfloat16), v_ref[0, 0],
                             (((1,), (0,)), ((), ())))
        elif variant == "C":  # bf16 softmax
            sb = (s * 0.0883883).astype(jnp.bfloat16)
            m_prev = m_s[:, :1]
            m_blk = jnp.max(sb, axis=1, keepdims=True).astype(jnp.float32)
            m_new = jnp.maximum(m_prev, m_blk)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(sb - m_new.astype(jnp.bfloat16))  # bf16 exp
            l_blk = jnp.sum(p, axis=1, keepdims=True).astype(jnp.float32)
            l_s[:, :1] = l_s[:, :1] * alpha + l_blk
            m_s[:, :1] = m_new
            acc[...] = acc[...] * alpha + sdot(
                p, v_ref[0, 0], (((1,), (0,)), ((), ())))
        else:  # A: f32 online softmax baseline
            s = s * 0.0883883
            m_prev = m_s[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_s[:, :1] = l_s[:, :1] * alpha + jnp.sum(s * 0 + p, axis=1,
                                                      keepdims=True)
            m_s[:, :1] = m_new
            acc[...] = acc[...] * alpha + sdot(
                p.astype(jnp.bfloat16), v_ref[0, 0],
                (((1,), (0,)), ((), ())))

        @pl.when(ki == nk - 1)
        def _fin():
            if variant == "B":
                o_ref[0, 0] = acc[...].astype(jnp.bfloat16)
            else:
                l = l_s[:, :1]
                o_ref[0, 0] = (acc[...] / jnp.where(l > 0, l, 1.0)).astype(
                    jnp.bfloat16)

    def build(variant):
        f = pl.pallas_call(
            functools.partial(kern, variant=variant),
            grid=(B, H, nq, nk),
            in_specs=[
                pl.BlockSpec((1, 1, BQ, D), lambda b, h, qi, ki: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, BK, D),
                             lambda b, h, qi, ki, g=group: (b, h // g, ki, 0)),
                pl.BlockSpec((1, 1, BK, D),
                             lambda b, h, qi, ki, g=group: (b, h // g, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, BQ, D),
                                   lambda b, h, qi, ki: (b, h, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, S, D), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((BQ, LANES), jnp.float32),
                pltpu.VMEM((BQ, LANES), jnp.float32),
                pltpu.VMEM((BQ, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * 3 + ("arbitrary",),
            ),
        )

        qt = jnp.swapaxes(q, 1, 2)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)

        def mk(m):
            @jax.jit
            def g(q_, k_, v_):
                def body(i, c):
                    return f(c, k_, v_).astype(jnp.bfloat16)
                return jnp.sum(jax.lax.fori_loop(0, m, body, q_)
                               .astype(jnp.float32))

            float(g(qt, kt, vt)); float(g(qt, kt, vt))
            return lambda: float(g(qt, kt, vt))

        return mk

    for variant in ("A", "B", "C"):
        try:
            mk = build(variant)
            t = paired(mk(4), mk(8), 4)
            tf = flops / t / 1e12
            print(f"{variant}: {t*1e3:.2f} ms, {tf:.1f} TF/s, "
                  f"{tf/197:.3f} of peak", flush=True)
        except Exception as e:
            print(f"{variant}: FAIL {repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    main()
