"""Multi-device sharding tests on the faked 8-device CPU mesh
(SURVEY.md 4.2: xla_force_host_platform_device_count)."""

import numpy as np
import jax
import pytest


requires_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 faked devices"
)


@requires_multidevice
def test_solve_batch_sharded_matches_unsharded():
    import socp_tpu
    from socp_tpu.models.robust_ls import robust_ls_batch
    from socp_tpu.parallel.batch import solve_batch_sharded
    from socp_tpu.parallel.mesh import batch_mesh

    c, G, h, dims = robust_ls_batch(0, batch=8, n=12, k=16)
    mesh = batch_mesh(8)
    xs, ys, ss, zs, status_s, ks, stats_s, _ = solve_batch_sharded(
        c, G, h, dims, mesh=mesh
    )
    sols = socp_tpu.solve_batch(c, G, h, dims)
    assert np.all(status_s == 0)
    for i, s1 in enumerate(sols):
        assert abs(stats_s[i, 0] - s1.pcost) <= 1e-7 * max(1.0, abs(s1.pcost))


@requires_multidevice
def test_graft_entry_dryrun():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out[0])))
    g.dryrun_multichip(8)


def test_pod_mesh_shapes():
    from socp_tpu.parallel.runtime import init_distributed, pod_mesh

    init_distributed()          # no-op single process
    mesh = pod_mesh(scenario_size=2)
    assert mesh.axis_names == ("scenario", "blocks")
    assert mesh.devices.shape[0] == 2
    assert mesh.devices.size == len(jax.devices())
