"""Multi-host (multi-process) training, end to end on this machine.

Two real JAX processes x four virtual CPU devices each, joined with
``jax.distributed.initialize`` (gloo collectives), run the REAL
:func:`gif_tpu.train.loop.train` loop over an 8-device global ``data``
mesh: per-process batch feeding via ``jax.make_array_from_process_local_
data``, cross-process pmean gradient all-reduce inside the sharded step,
process-0-only checkpoint/metrics, restore-on-every-process resume, and
the host-side FID-accumulator allgather.  This is the TPU-native mapping
of the reference's single-host ``nn.DataParallel`` boundary
(reference train.py:344,356-358; SURVEY.md §2.11/§5.8) — on a real pod
the same program runs with the TPU plugin supplying DCN transport.

The launcher re-execs this file per process with a CPU-pinned environment
(same scrubbing as ``__graft_entry__._cpu_mesh_env``).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # two subprocesses, compile-heavy (nightly tier)

_THIS = os.path.abspath(__file__)
_REPO = os.path.dirname(os.path.dirname(_THIS))
_NPROC = 2
_LOCAL_DEVICES = 4


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    flags.append(f"--xla_force_host_platform_device_count={_LOCAL_DEVICES}")
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("JAX_PLATFORM_NAME", None)
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            env.pop(k)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_two_process_training(tmp_path):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, _THIS, "--child", str(pid), str(port), str(tmp_path)],
            env=_child_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(_NPROC)
    ]
    outs = []
    failed = False
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            failed = True
        outs.append(out)
        failed = failed or p.returncode != 0
    if failed:
        raise AssertionError(
            "multi-process child failed:\n"
            + "\n".join(
                f"--- proc {i} rc={p.returncode} ---\n{o[-6000:]}"
                for i, (p, o) in enumerate(zip(procs, outs))
            )
        )
    for i, o in enumerate(outs):
        assert f"[p{i}] ALL OK" in o, o[-3000:]
    # Process-0 artifacts exist; the loop's is_main guard kept process 1 out.
    assert os.path.exists(tmp_path / "8" / "metrics.csv")
    assert os.path.isdir(tmp_path / "8" / "checkpoint")


# ---------------------------------------------------------------------------
# child body
# ---------------------------------------------------------------------------


def _child(pid: int, port: int, out_dir: str) -> None:
    from gif_tpu.parallel import (
        create_mesh,
        initialize_distributed,
        is_main_process,
        process_count,
    )

    initialize_distributed(f"localhost:{port}", _NPROC, pid)

    import jax

    from gif_tpu.data.pipeline import SyntheticFlameDataset
    from gif_tpu.flame.resources import synthetic_flame_resources
    from gif_tpu.parallel.collectives import allgather_rows
    from gif_tpu.train import get_config
    from gif_tpu.train.loop import train

    assert process_count() == _NPROC
    assert is_main_process() == (pid == 0)
    assert len(jax.devices()) == _NPROC * _LOCAL_DEVICES
    assert jax.local_device_count() == _LOCAL_DEVICES
    mesh = create_mesh()

    # --- host-side variable-row allgather (FID accumulator pooling) ---
    local = np.arange(3 + 2 * pid, dtype=np.float32)[:, None] + 100.0 * pid
    ids = np.arange(3 + 2 * pid, dtype=np.int32)
    rows, gids = allgather_rows((local, ids), max_rows=100)
    assert len(rows) == 3 + 5  # 3 rows from p0, 5 from p1
    # Rows interleave round-robin across processes (so a max_rows truncation
    # keeps a near-uniform share of every host's stream), alignment kept.
    np.testing.assert_array_equal(
        rows[:, 0], [0.0, 100.0, 1.0, 101.0, 2.0, 102.0, 103.0, 104.0]
    )
    np.testing.assert_array_equal(gids, [0, 0, 1, 1, 2, 2, 3, 4])
    # A tight cap keeps rows from BOTH processes, not just process 0.
    capped, _ = allgather_rows((local, ids), max_rows=4)
    np.testing.assert_array_equal(capped[:, 0], [0.0, 100.0, 1.0, 101.0])
    print(f"[p{pid}] allgather_rows OK", flush=True)

    # --- the real training loop over the global mesh ---
    cfg = get_config(
        8,
        embedding_vocab_size=16,
        max_size=16,
        init_size=16,
        render_image_size=32,
        batch_size=2 * _NPROC * _LOCAL_DEVICES,  # 2 per global device shard
        max_channels=16,
        nmlp_for_z_to_w=2,
        compute_dtype="float32",
        checkpoint_every=2,
        r1_interval=1,
    )
    res = synthetic_flame_resources(seed=1, n_vertices=203)
    ds = SyntheticFlameDataset(n=64, size=16)

    state = train(cfg, ds, res, out_dir, total_iters=2, mesh=mesh, log_every=1)
    assert int(state.step) == 2
    print(f"[p{pid}] train to step 2 OK", flush=True)

    # --- resume: every process restores the process-0 checkpoint ---
    state = train(cfg, ds, res, out_dir, total_iters=4, mesh=mesh, log_every=1)
    assert int(state.step) == 4
    print(f"[p{pid}] resume to step 4 OK", flush=True)

    print(f"[p{pid}] ALL OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
