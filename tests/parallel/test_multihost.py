"""Multi-host (DCN × ICI) serving path tests.

The 2-process CPU simulation (`scripts/multihost_dryrun.py`) is the
hardware-free validation of BASELINE config 5: hybrid mesh construction,
dcn-replicated TP weights, dcn-sharded batch/KV, one decode step with zero
DCN collectives, checked against a single-device oracle per host.
"""

import os
import subprocess
import sys

import jax
import pytest

from fastforward_tpu.parallel.multihost import (
    host_local_batch_slice,
    make_hybrid_mesh,
)

pytestmark = pytest.mark.multi_device


def test_hybrid_mesh_single_process():
    # Single-process: dcn axis has size 1; code written for the hybrid
    # layout must run unchanged.
    mesh = make_hybrid_mesh({"model": 4, "data": 2})
    assert dict(mesh.shape) == {"dcn": 1, "model": 4, "data": 2}
    assert mesh.devices.shape == (1, 4, 2)


def test_hybrid_mesh_infers_axis():
    mesh = make_hybrid_mesh({"data": 2, "model": -1})
    assert dict(mesh.shape) == {"dcn": 1, "data": 2, "model": 4}


def test_hybrid_mesh_rejects_bad_axes():
    with pytest.raises(ValueError, match="do not cover"):
        make_hybrid_mesh({"model": 3})


def test_host_local_batch_slice_single():
    import numpy as np
    from jax.sharding import Mesh

    mesh = make_hybrid_mesh({"model": 8})
    assert host_local_batch_slice(16, mesh) == slice(0, 16)
    # A 2-"host" mesh shape (same process — only the shape matters here)
    # must reject a batch that does not divide over hosts.
    mesh2 = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1), ("dcn", "model"))
    with pytest.raises(ValueError, match="not divisible"):
        host_local_batch_slice(3, mesh2)


@pytest.mark.slow
def test_two_process_dryrun():
    # Full 2-process jax.distributed CPU simulation in subprocesses (the
    # current process already owns a single-process jax runtime).
    script = os.path.join(
        os.path.dirname(__file__), "..", "..", "scripts", "multihost_dryrun.py"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.abspath(script)],
        env=env, capture_output=True, text=True, timeout=500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "multihost dryrun OK" in out.stdout
