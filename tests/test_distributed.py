"""Multi-process distributed bring-up smoke (2 CPU processes x 2 devices).

Covers the one parallel mechanism no in-process CPU mesh can reach
(SURVEY.md §2.3 multi-host MPI row): jax.distributed.initialize through
``initialize_distributed()``'s explicit-coordinator path, the host-major
``make_global_mesh()`` layout, and a cross-process collective — the analog
of the reference's ``mpiexecjl -n 2`` CI lane (JCRuntime.jl:6-16).
"""

from juliachem_jl_tpu.parallel.dist_smoke import run_smoke


def test_two_process_mesh_and_collective():
    results = run_smoke(n_procs=2, n_local=2)
    assert set(results) == {0, 1}
    for r in results.values():
        assert r["process_count"] == 2
        assert r["global_devices"] == 4
        # host-major layout: q spans hosts -> 2 q-rows x 2 k-cols
        assert r["mesh"] == [2, 2]
        assert abs(r["psum"] - r["want"]) < 1e-9
