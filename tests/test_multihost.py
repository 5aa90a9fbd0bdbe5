"""Multi-host (DCN) library scan: two OS processes, each with 4 virtual
CPU devices, join via jax.distributed into one (data x seq) mesh whose
data axis spans processes. The sharded result must match the
single-process engine (tools/multihost_worker.py asserts < 1e-4 LU).

This validates parallel/mesh.py's make_multihost_mesh/global_batch and
the DCN-spanning batch axis (SURVEY.md §5: 'DCN only for multi-host
library scans')."""

def test_two_process_dcn_dryrun():
    # dryrun_multihost kills the workers itself after its own timeout
    import __graft_entry__ as ge

    ge.dryrun_multihost(n_processes=2, devices_per_process=4)
