"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The TPU analog of the reference's multi-node MPI runs (SURVEY.md §4): the
sharded DF Fock build must agree with the single-device dense kernel to
machine precision, on several mesh shapes.
"""

import numpy as np
import pytest


def _problem():
    import __graft_entry__ as g

    return g._tiny_problem()


def test_graft_entry_compiles():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    F, D_new, E = jax.jit(fn)(*args)
    assert np.isfinite(float(E))
    assert np.asarray(F).shape == np.asarray(args[1]).shape


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_dryrun_multichip(n_devices):
    import __graft_entry__ as g

    g.dryrun_multichip(n_devices)


def test_sharded_matches_dense_2d_mesh():
    import jax.numpy as jnp

    from juliachem_jl_tpu.models.df import df_fock_kernel
    from juliachem_jl_tpu.parallel import mesh as mesh_mod
    from juliachem_jl_tpu.parallel import shard as shard_mod

    p = _problem()
    mesh = mesh_mod.make_mesh(8, k_axis=2)
    nq = 4
    B = mesh_mod.pad_to_multiple(p["B"], 0, nq)
    B = mesh_mod.pad_to_multiple(B, 2, 2)
    fock = shard_mod.make_df_fock_step(
        mesh, B.shape[0], p["nbf"], B.shape[2], p["nocc"])
    D_pad = np.pad(p["D"], ((0, 0), (0, B.shape[2] - p["nbf"])))
    G = fock(shard_mod.shard_B(mesh, B), jnp.asarray(D_pad), jnp.asarray(p["Cocc"]))
    G_ref = df_fock_kernel(jnp.asarray(p["B"]), jnp.asarray(p["D"]), jnp.asarray(p["Cocc"]))
    assert np.abs(np.asarray(G) - np.asarray(G_ref)).max() < 1e-10
