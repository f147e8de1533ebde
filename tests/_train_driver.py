"""Subprocess driver for the kill/restart recovery test (not collected by
pytest).  Runs a deterministic tiny-llama training loop that checkpoints
every step and resumes from the latest checkpoint on restart — the
restart-from-checkpoint recovery policy (SURVEY.md §5 failure detection:
TPU-idiomatic recovery is process restart, not elastic membership).

Usage: python tests/_train_driver.py WORKDIR TOTAL_STEPS
Writes WORKDIR/progress.txt (completed step count) after every step and
WORKDIR/final.npz (flattened params) at the end.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    workdir, total_steps = sys.argv[1], int(sys.argv[2])
    from flash_attn_tpu.models import llama
    from flash_attn_tpu.utils.checkpoint import TrainCheckpointManager
    from flash_attn_tpu.utils.train import TrainConfig, make_train_step

    cfg = llama.LlamaConfig(
        vocab_size=128, hidden=32, intermediate=64, num_layers=1,
        num_heads=2, num_kv_heads=2, head_dim=16, max_position=32,
        rope_theta=10000.0, dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(learning_rate=1e-3)
    init_fn, step_fn = make_train_step(
        lambda p, t: llama.forward(p, t, cfg, interpret=True), tcfg
    )
    opt_state = init_fn(params)
    step_jit = jax.jit(step_fn)

    mgr = TrainCheckpointManager(os.path.join(workdir, "ckpt"), max_to_keep=2)
    start, restored = mgr.restore_latest(
        like={"params": params, "opt": opt_state}
    )
    if restored is not None:
        params, opt_state = restored["params"], restored["opt"]
        start = start + 1
    else:
        start = 0

    for step in range(start, total_steps):
        key = jax.random.PRNGKey(1000 + step)  # per-step deterministic data
        tokens = jax.random.randint(key, (2, 16), 0, cfg.vocab_size)
        targets = jnp.roll(tokens, -1, axis=1)
        params, opt_state, metrics = step_jit(params, opt_state, tokens,
                                              targets)
        mgr.save(step, {"params": params, "opt": opt_state})
        mgr.mgr.wait_until_finished()
        with open(os.path.join(workdir, "progress.txt"), "w") as f:
            f.write(str(step))
    mgr.close()

    leaves = jax.tree.leaves(params)
    np.savez(
        os.path.join(workdir, "final.npz"),
        **{f"l{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )
    print("TRAIN DONE")


if __name__ == "__main__":
    main()
