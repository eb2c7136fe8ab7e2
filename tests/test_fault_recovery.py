"""Fault injection: kill a sharded-BA job mid-run, resume from checkpoint.

SURVEY.md §5 failure-detection/recovery row: a preempted multi-host BA job
must resume from its last checkpoint and reach the same result as an
uninterrupted run. The worker optimizes in chunks, checkpointing after each
chunk via tpusfm.utils.checkpoint (atomic npz swap); with CRASH_AFTER_CHUNK
set it SIGKILLs itself mid-job (a real unclean death — no atexit, no flush).
A relaunch resumes from the surviving checkpoint. Because LM state restarts
identically at each chunk boundary in both runs, the recovered result is
bit-identical to the uninterrupted chunked run.
"""
import os
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, signal, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.getcwd())
    from tpusfm.ba.solver import mean_reprojection_error
    from tpusfm.ba.tracks import Observations
    from tpusfm.config import BaConfig
    from tpusfm.dist.mesh import make_mesh
    from tpusfm.dist.sharded_ba import sharded_bundle_adjust
    from tpusfm.geometry.projection import project_points
    from tpusfm.utils.checkpoint import load_reconstruction, save_reconstruction

    ckpt = sys.argv[1]
    crash_after = int(os.environ.get("CRASH_AFTER_CHUNK", "-1"))
    n_chunks, iters_per_chunk = 4, 3

    rng = np.random.default_rng(0)
    K = jnp.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    dist = jnp.zeros(5)
    n_views, n_points = 4, 64
    X = rng.uniform([-2, -2, 6], [2, 2, 10], size=(n_points, 3)).astype(np.float32)
    cams = np.stack([
        np.array([0.02 * v, 0.15 * v - 0.2, 0.01 * v,
                  0.5 * v - 1.0, 0.05 * v, 0.1 * v], np.float32)
        for v in range(n_views)
    ])
    xy, cam_i, pt_i = [], [], []
    for v in range(n_views):
        pix = np.array(project_points(jnp.array(X), jnp.array(cams[v, :3]),
                                      jnp.array(cams[v, 3:]), K, dist))
        pix += rng.normal(size=pix.shape) * 0.3
        xy.append(pix); cam_i.append(np.full(n_points, v)); pt_i.append(np.arange(n_points))
    obs = Observations(
        xy=jnp.array(np.concatenate(xy).astype(np.float32)),
        cam=jnp.array(np.concatenate(cam_i).astype(np.int32)),
        pt=jnp.array(np.concatenate(pt_i).astype(np.int32)),
        mask=jnp.ones(n_views * n_points, bool),
    )
    cams0 = cams + np.concatenate(
        [np.zeros((1, 6)), rng.normal(size=(3, 6)) * 0.02]).astype(np.float32)
    X0 = X + rng.normal(size=X.shape).astype(np.float32) * 0.05

    if os.path.exists(ckpt):
        st = load_reconstruction(ckpt)
        c, p, start = jnp.array(st["cams"]), jnp.array(st["points"]), st["ba_iteration"]
        print(f"RESUMED from chunk {start}", flush=True)
    else:
        c, p, start = jnp.array(cams0), jnp.array(X0), 0

    mesh = make_mesh()
    cfg = BaConfig(max_iters=iters_per_chunk)
    for chunk in range(start, n_chunks):
        c, p, _ = sharded_bundle_adjust(c, p, obs, K, dist, mesh, cfg, 1)
        save_reconstruction(ckpt, c, p, np.ones(n_points, bool), obs,
                            ba_iteration=chunk + 1)
        if chunk + 1 == crash_after:
            os.kill(os.getpid(), signal.SIGKILL)   # unclean death, mid-job

    err = float(mean_reprojection_error(c, p, obs, K, dist))
    cs = ",".join(f"{v:.8e}" for v in np.asarray(c).reshape(-1)[:12])
    print(f"FINAL err={err:.6f} cams12={cs}", flush=True)
    """
)


def _run(worker, ckpt, crash_after=None):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    if crash_after is not None:
        env["CRASH_AFTER_CHUNK"] = str(crash_after)
    p = subprocess.run([sys.executable, str(worker), str(ckpt)],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=420)
    return p


def test_kill_and_resume_sharded_ba(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    # uninterrupted chunked run -> ground-truth final state
    clean = _run(worker, tmp_path / "clean.npz")
    assert clean.returncode == 0, clean.stdout + clean.stderr
    final_clean = [l for l in clean.stdout.splitlines() if l.startswith("FINAL")]
    assert final_clean, clean.stdout

    # crashed run: SIGKILL after chunk 2 of 4
    ck = tmp_path / "crash.npz"
    crashed = _run(worker, ck, crash_after=2)
    assert crashed.returncode == -9, (crashed.returncode, crashed.stdout)
    assert ck.exists(), "checkpoint must survive the kill"
    assert not str(ck).endswith(".tmp.npz")

    # resume: must pick up at chunk 2 and reach the identical final state
    resumed = _run(worker, ck)
    assert resumed.returncode == 0, resumed.stdout + resumed.stderr
    assert "RESUMED from chunk 2" in resumed.stdout, resumed.stdout
    final_resumed = [l for l in resumed.stdout.splitlines() if l.startswith("FINAL")]
    assert final_resumed
    assert final_resumed[0] == final_clean[0], (final_clean[0], final_resumed[0])
