"""Multi-host plumbing (andvaranaut_tpu/distributed.py) on the 8-device
CPU mesh: initialize() must no-op gracefully in a single process, and the
hierarchical (chains, data) mesh must carry the sharded NLML over its data
sub-axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from andvaranaut_tpu import distributed
from andvaranaut_tpu.gp import engine, kernels, sharded


def test_initialize_single_process_noop():
    assert distributed.initialize() is False
    # idempotent
    assert distributed.initialize() is False


def test_global_data_mesh():
    mesh = distributed.global_data_mesh()
    assert mesh.shape["data"] == jax.device_count()


def test_hierarchical_mesh_shapes():
    mesh = distributed.hierarchical_mesh()
    assert mesh.shape == {"chains": 1, "data": jax.device_count()}
    mesh2 = distributed.hierarchical_mesh(num_slices=2)
    assert mesh2.shape == {"chains": 2, "data": jax.device_count() // 2}
    with pytest.raises(ValueError):
        distributed.hierarchical_mesh(num_slices=3)


def test_sharded_nlml_over_hierarchical_data_axis():
    """The distributed NLML runs over the data sub-axis of a 2-D
    (chains, data) mesh — the layout that keeps Cholesky collectives on
    ICI and chains on DCN at pod scale."""
    mesh = distributed.hierarchical_mesh(num_slices=2)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(32, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(X[:, 0])))
    build_rvpack, nlp = sharded.make_sharded_nlml(
        mesh, ("RBF",), (), True, 1e-6)
    rvpack = build_rvpack(2)
    z = rvpack.z0() + 0.1
    got = float(nlp(z, X, y, rvpack))

    vals = rvpack.unpack(z)
    K = kernels.gram(("RBF",), (), X, None, vals["l"], vals["kv"], None)
    K = K + jnp.eye(32, dtype=X.dtype) * (1e-6 + vals["gv"][0])
    want = float(-(engine.chol_nlml(K, y) + rvpack.log_prior(z)))
    assert got == pytest.approx(want, rel=1e-10)
