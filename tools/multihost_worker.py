"""One process of a multi-host (DCN) library-scan dryrun.

Usage (spawned once per process by __graft_entry__.dryrun_multihost or
tests/test_multihost.py):

    python tools/multihost_worker.py PROCESS_ID NUM_PROCESSES PORT DEVS_PER_PROC

Each process owns DEVS_PER_PROC virtual CPU devices and 2 local tracks;
together they form a (data x seq) mesh whose data axis spans processes
(the DCN axis — embarrassingly parallel tracks) and whose seq axis stays
inside a process (the ICI axis — IIR state handoff + gating collectives,
parallel/seqshard.py). The sharded result must match a single-process
reference bit-for-bit in LUFS terms.
"""

import os
import sys


def main() -> int:
    pid, nproc, port, devs = map(int, sys.argv[1:5])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devs}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env var
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from soundscope_tpu.core.config import MeterConfig
    from soundscope_tpu.models.engine import analyze_batch_native
    from soundscope_tpu.parallel import (
        global_batch,
        make_multihost_mesh,
        pad_for_mesh,
        sharded_analyze_fn,
    )

    assert jax.process_count() == nproc
    assert jax.local_device_count() == devs

    seq = 2 if devs % 2 == 0 else 1
    mesh = make_multihost_mesh(seq=seq)
    assert mesh.shape["data"] * mesh.shape["seq"] == nproc * devs

    # Every process generates the FULL deterministic track set and keeps
    # its slice — so each can also compute the single-process reference.
    cfg = MeterConfig(channels=2, rate=16000, max_blocks=0)
    per_proc = mesh.shape["data"] // nproc  # data rows owned by this process
    b_global = mesh.shape["data"]
    n = int(3.0 * cfg.rate)
    npad = pad_for_mesh(n, cfg, seq)
    rng = np.random.default_rng(0)
    x_all = (rng.standard_normal((b_global, 2, npad)) * 0.05).astype(np.float32)
    x_all[:, :, n:] = 0.0
    nv_all = np.full(b_global, n, np.int32)

    lo = pid * per_proc
    xs, nv = global_batch(mesh, x_all[lo: lo + per_proc], nv_all[lo: lo + per_proc])
    fn = jax.jit(sharded_analyze_fn(cfg, mesh))
    res = fn(xs, nv)
    got = np.asarray(
        multihost_utils.process_allgather(res.integrated_lufs, tiled=True)
    ).reshape(-1)[:b_global]

    ref = analyze_batch_native(cfg)(jnp.asarray(x_all), jnp.asarray(nv_all))
    want = np.asarray(ref.integrated_lufs)
    err = float(np.max(np.abs(got - want)))
    assert err < 1e-4, f"multihost mismatch: {err}"
    print(f"MULTIHOST_OK pid={pid} mesh=({mesh.shape['data']}x{mesh.shape['seq']}) "
          f"tracks={b_global} max_err={err:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
