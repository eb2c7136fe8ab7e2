"""Multi-host (2-process) distributed tests over DCN-analog transport.

SURVEY.md §5 "Distributed communication backend": on real pods the mesh
spans hosts over DCN after `jax.distributed.initialize`; here two OS
processes with 2 virtual CPU devices each form a 4-device global mesh
(Gloo transport), and the flagship distributed workload — sharded bundle
adjustment (tpusfm.dist.sharded_ba) — must reproduce the single-chip
result. This exercises exactly the code path `tpusfm.dist.mesh.init_multihost`
wraps; the reference has no analog (single process, main.cpp:13).
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    addr, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(addr, num_processes=2, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    sys.path.insert(0, os.getcwd())
    from tpusfm.ba.solver import bundle_adjust, mean_reprojection_error
    from tpusfm.ba.tracks import Observations
    from tpusfm.config import BaConfig
    from tpusfm.dist.sharded_ba import sharded_bundle_adjust
    from tpusfm.geometry.projection import project_points

    # synthetic BA problem, identical in both processes (fixed seed)
    rng = np.random.default_rng(0)
    K = jnp.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    dist = jnp.zeros(5)
    n_views, n_points = 4, 64   # 256 obs: divisible by the 4 global devices
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
    xy = np.concatenate(xy).astype(np.float32)
    cam_i = np.concatenate(cam_i).astype(np.int32)
    pt_i = np.concatenate(pt_i).astype(np.int32)
    mask = np.ones(len(xy), bool)
    cams0 = cams + np.concatenate(
        [np.zeros((1, 6)), rng.normal(size=(3, 6)) * 0.02]).astype(np.float32)
    X0 = (X + rng.normal(size=X.shape).astype(np.float32) * 0.05)

    # single-process reference on the first local device
    obs_local = Observations(xy=jnp.array(xy), cam=jnp.array(cam_i),
                             pt=jnp.array(pt_i), mask=jnp.array(mask))
    cfg = BaConfig(max_iters=8)
    c_ref, p_ref, _ = bundle_adjust(jnp.array(cams0), jnp.array(X0),
                                    obs_local, K, dist, cfg, 1)
    e_ref = float(mean_reprojection_error(c_ref, p_ref, obs_local, K, dist))

    # global 4-device mesh spanning both processes
    mesh = Mesh(np.array(jax.devices()), ("d",))
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("d"))
    n_local = len(xy) // 2

    def gshard(a):
        lo = pid * n_local
        return jax.make_array_from_process_local_data(shd, a[lo:lo + n_local], a.shape)

    def grep(a):
        return jax.make_array_from_process_local_data(rep, a, a.shape)

    obs_g = Observations(xy=gshard(xy), cam=gshard(cam_i),
                         pt=gshard(pt_i), mask=gshard(mask))
    c2, p2, _ = sharded_bundle_adjust(grep(cams0), grep(X0), obs_g,
                                      grep(np.asarray(K, np.float32)),
                                      grep(np.zeros(5, np.float32)),
                                      mesh, cfg, 1)
    c2l = np.asarray(c2.addressable_shards[0].data)
    e2 = float(mean_reprojection_error(jnp.array(c2l),
                                       jnp.array(np.asarray(p2.addressable_shards[0].data)),
                                       obs_local, K, dist))
    np.testing.assert_allclose(np.asarray(c_ref), c2l, atol=1e-2)
    assert abs(e_ref - e2) < 0.05, (e_ref, e2)
    print(f"MULTIHOST_OK {pid} err_ref={e_ref:.4f} err_sharded={e2:.4f}", flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_ba(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    addr = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), addr, str(i)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"MULTIHOST_OK {i}" in out, out
