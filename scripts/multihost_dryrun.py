#!/usr/bin/env python
"""2-process CPU simulation of the multi-host serving path (BASELINE cfg 5).

Each process plays one "host" with FF_MH_LOCAL CPU devices; together they
form a (dcn=2, model=N) hybrid mesh (`parallel/multihost.py`). Weights are
TP-sharded over the ICI ``model`` axis and replicated over ``dcn``; the
token batch and KV cache shard over ``dcn``. One decode step of the tiny
Llama engine runs under this layout and every process checks its local
batch shard's tokens against a single-device oracle — validating that the
decode step needs zero DCN collectives and scales host-linearly.

Run (driver mode — spawns both processes):
    python scripts/multihost_dryrun.py

Worker mode (used internally):
    FF_MH_ROLE=worker FF_MH_PROC=<i> FF_MH_NPROC=2 FF_MH_PORT=<p> \
        python scripts/multihost_dryrun.py
"""

import os
import subprocess
import sys


def worker() -> None:
    proc = int(os.environ["FF_MH_PROC"])
    nproc = int(os.environ["FF_MH_NPROC"])
    port = os.environ["FF_MH_PORT"]
    local = int(os.environ.get("FF_MH_LOCAL", "2"))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=proc,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fastforward_tpu.models.llama import LlamaConfig
    from fastforward_tpu.parallel.multihost import (
        host_local_batch_slice,
        make_hybrid_mesh,
    )
    from fastforward_tpu.parallel.tp_serving import (
        make_tp_decode_step,
        shard_for_tp,
    )
    from fastforward_tpu.serving.stacked import (
        StackedKVCache,
        random_stacked_params,
        serving_forward_stacked,
    )

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * local

    mesh = make_hybrid_mesh({"model": local}, dcn_axis="dcn")
    assert dict(mesh.shape) == {"dcn": nproc, "model": local}
    # Every inner-axis row must be single-process (collectives ride "ICI").
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1

    B_local = 2
    global_batch = B_local * nproc
    sl = host_local_batch_slice(global_batch, mesh)
    assert sl == slice(proc * B_local, (proc + 1) * B_local)

    config = LlamaConfig.tiny()
    # Identical (seeded) params on every process — replicated over dcn.
    params, stacked = random_stacked_params(config, mode="w8a8", seed=0)

    max_len = 16
    cache = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=global_batch, max_len=max_len,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        quantized=True,
    )
    rng = np.random.RandomState(0)
    tokens_global = rng.randint(0, config.vocab_size, (global_batch, 1))

    params_s, stacked_s, cache_s = shard_for_tp(
        params, stacked, cache, mesh, data_axis="dcn"
    )
    batch_sharding = NamedSharding(mesh, P("dcn", None))
    tok = jax.make_array_from_process_local_data(
        batch_sharding, tokens_global[sl], (global_batch, 1)
    )

    step = make_tp_decode_step(
        config, mesh, stacked, params, cache, data_axis="dcn"
    )
    logits, cache_s = step(params_s, stacked_s, cache_s, tok, jnp.asarray([0]))
    # Gather this host's local logits shard (model-axis devices hold
    # replicated copies — dedup by shard index).
    parts = {
        (s.index[0].start or 0): np.asarray(s.data)
        for s in logits.addressable_shards
    }
    local_logits = np.concatenate([parts[k] for k in sorted(parts)])[:, -1]

    # Oracle: unsharded single-device forward of the local slice.
    cache_ref = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=B_local, max_len=max_len,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        quantized=True,
    )
    ref_logits, _ = serving_forward_stacked(
        params, stacked, config, jnp.asarray(tokens_global[sl]), cache_ref,
        positions=jnp.asarray([0]),
    )
    # Per-shard dynamic activation quantization uses local amax (a finer
    # grid than the global amax), so logits are close but not bit-identical.
    ref = np.asarray(ref_logits[:, -1])
    err = np.abs(local_logits - ref).max()
    assert err < 0.5, err

    print(
        f"proc {proc}: multihost dryrun OK (mesh={dict(mesh.shape)}, "
        f"max |logit err| {err:.3f})",
        flush=True,
    )


def driver() -> None:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    nproc = int(os.environ.get("FF_MH_NPROC", "2"))
    env = dict(os.environ, FF_MH_ROLE="worker", FF_MH_NPROC=str(nproc),
               FF_MH_PORT=str(port))
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=dict(env, FF_MH_PROC=str(i)),
        )
        for i in range(nproc)
    ]
    rc = [p.wait(timeout=600) for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes: {rc}")
    print("multihost dryrun OK")


if __name__ == "__main__":
    if os.environ.get("FF_MH_ROLE") == "worker":
        worker()
    else:
        driver()
