"""Multi-device tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scema_tpu.parallel.mesh_utils import make_mesh, shard_md_update, pad_to_multiple
from scema_tpu.config import HMMConfig
from scema_tpu.hmm.problem import build_hooke_hmm


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_pad_to_multiple():
    x = jnp.arange(10)
    p, n = pad_to_multiple(x, 8)
    assert p.shape[0] == 16 and n == 10


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    cfg = HMMConfig()
    cfg = cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=2, y_cells=2, z_cells=3),
        bridging=cfg.bridging.__class__(stress_method=0, approx_md_with_hookes_law=True),
        time=cfg.time.__class__(timestep_length=5.0e-7, start_timestep=1, end_timestep=10),
    )
    mesh = make_mesh(8)
    hmm_sharded = build_hooke_hmm(cfg, device_mesh=mesh)
    hmm_single = build_hooke_hmm(cfg)

    s0 = hmm_sharded.init_state()
    s1 = hmm_single.init_state()
    step0 = jax.jit(hmm_sharded.step)
    step1 = jax.jit(hmm_single.step)
    for _ in range(4):
        s0, o0 = step0(s0)
        s1, o1 = step1(s1)
    sig0 = np.asarray(s0.qp.new_stress)
    sig1 = np.asarray(s1.qp.new_stress)
    assert np.allclose(sig0, sig1, atol=1e-9 * max(np.abs(sig1).max(), 1.0))
    assert int(o0.n_jobs) == int(o1.n_jobs)


@pytest.mark.slow
def test_graft_entry_and_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out_state, out = jax.jit(fn)(*args)
    jax.block_until_ready(out_state)
    ge.dryrun_multichip(8)


def test_sharded_pairwise_l2_matches_local():
    from scema_tpu.parallel.mesh_utils import shard_pairwise_l2
    from scema_tpu.clustering.similarity import pairwise_l2
    import numpy as np

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((37, 60)))
    d_shard = np.asarray(shard_pairwise_l2(mesh)(s))
    d_local = np.asarray(pairwise_l2(s))
    assert np.allclose(d_shard, d_local, atol=1e-12)


@pytest.mark.slow
def test_sharded_md_coupled_step_matches_single_device():
    """The real-MD coupled step with the job batch shard_mapped over 8
    devices produces the same stress field as the unsharded step (the
    dryrun only checks it executes; this checks P3 changes nothing)."""
    from scema_tpu.hmm.md_coupling import build_md_hmm
    from scema_tpu.md.material import MaterialSpec

    cfg = HMMConfig()
    cfg = cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=1, y_cells=1, z_cells=2),
        time=cfg.time.__class__(timestep_length=5.0e-7, start_timestep=1,
                                end_timestep=2),
        bridging=cfg.bridging.__class__(stress_method=0,
                                        approx_md_with_hookes_law=False),
        material=cfg.material.__class__(number_of_replicas=1,
                                        materials=("sic",),
                                        proportions=(1.0,)),
        md=cfg.md.__class__(temperature=0.01, timestep_length=0.05,
                            strain_rate=1.0e-2, nsteps_sample=10,
                            force_field="sw"),
        dtype="float64",
        md_dtype="float64",
    )
    spec = MaterialSpec(name="sic", force_field="sw", n_cells=2)

    def run(mesh):
        hmm = build_md_hmm(cfg, spec=spec, equil_steps=0, minimize_steps=10,
                           device_mesh=mesh)
        carry = hmm.init_state()
        step = jax.jit(hmm.step)
        for _ in range(2):
            carry, out = step(carry)
        return np.asarray(carry[0].qp.new_stress), int(out.n_jobs)

    sig1, n1 = run(None)
    sig8, n8 = run(make_mesh(8))
    assert n1 == n8 > 0
    scale = np.abs(sig1).max()
    assert np.abs(sig8 - sig1).max() / scale < 1e-10


def test_multislice_mesh_hooke_step_matches_single_device():
    """P8 multi-slice prototype: the coupled step sharded over a
    two-axis ("dcn", "md") mesh — job buckets across slices, ICI shards
    within — equals the unsharded step.  TPU-native stand-in for the
    reference's PJM multi-allocation dispatch (stmd_sync.h:728-855,
    optimization_pjm/optimization_hmm.py)."""
    from scema_tpu.parallel.mesh_utils import make_multislice_mesh

    cfg = HMMConfig()
    cfg = cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=2, y_cells=2, z_cells=3),
        bridging=cfg.bridging.__class__(stress_method=0,
                                        approx_md_with_hookes_law=True),
        time=cfg.time.__class__(timestep_length=5.0e-7, start_timestep=1,
                                end_timestep=10),
    )
    mesh2 = make_multislice_mesh(2, 4)
    assert mesh2.axis_names == ("dcn", "md") and mesh2.size == 8
    hmm_sliced = build_hooke_hmm(cfg, device_mesh=mesh2)
    hmm_single = build_hooke_hmm(cfg)
    s0, s1 = hmm_sliced.init_state(), hmm_single.init_state()
    step0, step1 = jax.jit(hmm_sliced.step), jax.jit(hmm_single.step)
    for _ in range(3):
        s0, o0 = step0(s0)
        s1, o1 = step1(s1)
    sig0, sig1 = np.asarray(s0.qp.new_stress), np.asarray(s1.qp.new_stress)
    assert np.allclose(sig0, sig1, atol=1e-9 * max(np.abs(sig1).max(), 1.0))
    assert int(o0.n_jobs) == int(o1.n_jobs)


@pytest.mark.slow
def test_multislice_mesh_md_coupled_step():
    """The real-MD coupled step also shards over the two-axis mesh (the
    job chunk divides by mesh.size, collectives tier over dcn x md)."""
    from scema_tpu.hmm.md_coupling import build_md_hmm
    from scema_tpu.md.material import MaterialSpec
    from scema_tpu.parallel.mesh_utils import make_multislice_mesh

    cfg = HMMConfig()
    cfg = cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=1, y_cells=1, z_cells=2),
        time=cfg.time.__class__(timestep_length=5.0e-7, start_timestep=1,
                                end_timestep=2),
        bridging=cfg.bridging.__class__(stress_method=0,
                                        approx_md_with_hookes_law=False),
        material=cfg.material.__class__(number_of_replicas=1,
                                        materials=("sic",),
                                        proportions=(1.0,)),
        md=cfg.md.__class__(temperature=0.01, timestep_length=0.05,
                            strain_rate=1.0e-2, nsteps_sample=10,
                            force_field="sw"),
        dtype="float64",
        md_dtype="float64",
    )
    spec = MaterialSpec(name="sic", force_field="sw", n_cells=2)

    def run(mesh):
        hmm = build_md_hmm(cfg, spec=spec, equil_steps=0, minimize_steps=10,
                           device_mesh=mesh)
        carry = hmm.init_state()
        carry, out = jax.jit(hmm.step)(carry)
        return np.asarray(carry[0].qp.new_stress), int(out.n_jobs)

    sig1, n1 = run(None)
    sig2, n2 = run(make_multislice_mesh(2, 4))
    assert n1 == n2 > 0
    scale = np.abs(sig1).max()
    assert np.abs(sig2 - sig1).max() / scale < 1e-10


def test_node_sharded_fe_matches_replicated():
    """P2 completion: FE nodal AND qp state sharded over the mesh via
    GSPMD annotations (fem/sharded.py) — same physics as the replicated
    posture to roundoff, with the persistent state actually distributed
    (the reference replicates the triangulation per rank and lists
    distributing it as future work, READMEs/Parallelization.md)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scema_tpu.fem.sharded import make_sharded_step, shard_fe_state

    # 3x3x7 cells: 4*4*8 = 128 nodes -> 384 dofs and 63*8 = 504 qps,
    # both divisible by the 8 devices (required for explicit shardings)
    cfg = HMMConfig()
    cfg = cfg.replace(
        mesh=cfg.mesh.__class__(x_cells=3, y_cells=3, z_cells=7),
        bridging=cfg.bridging.__class__(
            stress_method=0, approx_md_with_hookes_law=True),
        time=cfg.time.__class__(
            timestep_length=5.0e-7, start_timestep=1, end_timestep=10),
    )
    hmm = build_hooke_hmm(cfg)
    mesh = make_mesh(8)
    step_s = jax.jit(make_sharded_step(hmm, mesh))
    step_r = jax.jit(hmm.step)
    s0 = shard_fe_state(hmm.init_state(), mesh)
    s1 = hmm.init_state()
    for _ in range(4):
        s0, o0 = step_s(s0)
        s1, o1 = step_r(s1)

    sig0 = np.asarray(s0.qp.new_stress)
    sig1 = np.asarray(s1.qp.new_stress)
    assert np.allclose(sig0, sig1, atol=1e-9 * max(np.abs(sig1).max(), 1.0))
    u0, u1 = np.asarray(s0.u), np.asarray(s1.u)
    assert np.allclose(u0, u1, atol=1e-12 * max(np.abs(u1).max(), 1.0))
    assert int(o0.n_jobs) == int(o1.n_jobs)

    # the memory posture is real: nodal and qp arrays live distributed
    want_u = NamedSharding(mesh, P("md"))
    assert s0.u.sharding.is_equivalent_to(want_u, s0.u.ndim)
    want_qp = NamedSharding(mesh, P("md", None))
    assert s0.qp.new_stress.sharding.is_equivalent_to(
        want_qp, s0.qp.new_stress.ndim)
    # more than one distinct shard index => not replicated
    assert len({sh.index for sh in s0.u.addressable_shards}) > 1
