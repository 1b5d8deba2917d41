"""Lane-culling safety: the shipped workspace envelopes must contain the
arm's actual reachable set, and culling must be physically invisible."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.maths import quat as quatm
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import dynamics as D
from pybullet_multigoal_gym_tpu.ops import fk, ik
from pybullet_multigoal_gym_tpu.ops import lane_cull as LC
from pybullet_multigoal_gym_tpu.ops import scene as S

REST = jnp.asarray(KM.KUKA_REST_POSE, jnp.float32)


def _sample_envelope(lo, hi, wobble, n=512, seed=7):
    """Re-derive the sphere envelope the way lane_cull documents it: IK
    solutions over the box + joint-space interpolations between pairs."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    tgts = jax.random.uniform(k1, (n, 3)) * (hi - lo) + lo
    corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                        for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
    tgts = jnp.concatenate([tgts, jnp.asarray(corners, jnp.float32)])

    def solve(t):
        return ik.solve(t, q_init=REST, rest_pose=REST)
    qs = jax.jit(jax.vmap(solve))(tgts)
    if wobble:
        zyz0 = jnp.array([np.pi, np.pi, -np.pi], jnp.float32)
        wob = (jax.random.uniform(k2, (tgts.shape[0], 3)) * 2 - 1) * 0.6
        quats = jax.vmap(quatm.euler_zyz_to_quat)(zyz0 + wob)

        def solve_rot(t, tq):
            return ik.solve(t, target_quat=tq, q_init=REST, rest_pose=REST)
        qs = jnp.concatenate([qs, jax.jit(jax.vmap(solve_rot))(tgts, quats)])
    perm = jax.random.permutation(k3, qs.shape[0])
    interp = jnp.concatenate([qs * (1 - t) + qs[perm] * t
                              for t in (0.3, 0.5, 0.7)])
    allq = jnp.concatenate([qs, interp])

    def stats(q):
        lp, lr = fk.link_frames(q)
        sph = D.arm_sphere_positions(lp, lr)
        tip, _ = fk.tip_pose(q)
        return sph, jnp.linalg.norm(sph - tip[None], axis=-1)
    sph, tipd = jax.jit(jax.vmap(stats))(allq)
    return np.asarray(sph), np.asarray(tipd)


@pytest.mark.parametrize('name,lo,hi,wobble', [
    ('table', [-0.67, -0.20, 0.175], [-0.37, 0.20, 0.55], False),
    ('low', [-0.755, -0.20, 0.03], [-0.37, 0.20, 0.55], True),
])
def test_envelope_conservative(name, lo, hi, wobble):
    """Fresh sampling must stay inside the shipped envelope (the MARGIN=0.05
    applied by every reachability test absorbs residual sampling slack)."""
    sph, tipd = _sample_envelope(np.array(lo, np.float32),
                                 np.array(hi, np.float32), wobble)
    env = LC.ENVELOPE[name]
    slack = 0.03
    for sp in range(len(KM.ARM_SPHERE_RADIUS)):
        assert sph[:, sp, 2].min() >= env['min_z'][sp] - slack, (name, sp)
        assert sph[:, sp, 0].min() >= env['min_x'][sp] - slack, (name, sp)
        assert sph[:, sp, 0].max() <= env['max_x'][sp] + slack, (name, sp)
        assert np.abs(sph[:, sp, 1]).max() <= env['max_abs_y'][sp] + slack, \
            (name, sp)
        assert tipd[:, sp].min() >= env['min_tip_dist'][sp] - slack, (name, sp)


def test_cull_keeps_critical_lanes():
    """The lanes that carry real physics must survive culling."""
    push = LC.arm_lane_mask(S.single_step_scene(True), True)
    assert push['plane'][6], 'palm-vs-table lane culled'
    assert push['geom'][6][0] and push['geom'][5][0], 'wrist/palm-vs-block'
    chest = LC.arm_lane_mask(
        S.multi_step_scene(1, True, 'front_sliding'), True)
    assert chest['door'][6], 'palm-vs-door lane culled (chest spawn fix)'
    # joint control keeps everything
    full = LC.arm_lane_mask(S.single_step_scene(True), False)
    assert all(full['plane']) and all(all(g) for g in full['geom'])


def test_cull_physically_invisible():
    """A culled engine and a full engine must produce (near-)identical
    trajectories on a contact-rich sweep: the culled lanes never activate,
    so only lane-summation order may differ."""
    from pybullet_multigoal_gym_tpu.envs.single_step import KukaSingleStepEnv
    cfg = EnvConfig(task='push')
    env = KukaSingleStepEnv(cfg)
    assert env.engine.n_contacts < D.Engine(
        env.engine.spec, ik_workspace=False).n_contacts
    eng_full = D.Engine(env.engine.spec, ik_workspace=False,
                        gripper=cfg.gripper)
    state, obs = env.reset(jax.random.PRNGKey(3))
    ph_c = ph_f = state.phys
    block_xy = np.asarray(state.phys.body_pos)[0, :2]

    step_c = jax.jit(env.engine.control_step)
    step_f = jax.jit(eng_full.control_step)
    tgt = jnp.asarray([*block_xy, 0.19], jnp.float32)
    max_force = 0.0
    for t in range(12):
        # sweep the EE onto the block, fingers squeezing it (0.03 target
        # closes the pads onto the 0.03 m block)
        q_t = ik.solve(tgt, q_init=ph_c.q, rest_pose=jnp.asarray(env.rest_pose))
        ctrl = D.Controls(q_target=q_t,
                          f_target=jnp.full((2,), 0.03, jnp.float32),
                          door_motor_on=jnp.zeros((), bool),
                          door_target=jnp.zeros((), jnp.float32))
        ph_c = step_c(ph_c, ctrl)
        ph_f = step_f(ph_f, ctrl)
        max_force = max(max_force,
                        float(jnp.abs(ph_c.ee_contact_force).max()))
    np.testing.assert_allclose(np.asarray(ph_c.q), np.asarray(ph_f.q),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(ph_c.body_pos),
                               np.asarray(ph_f.body_pos), atol=2e-3)
    # the sweep actually made contact (the comparison is not vacuous):
    # force peak during the sweep + the block was displaced. (The FINAL
    # step's force can read zero — the pushed block escapes the pads.)
    moved = np.linalg.norm(np.asarray(ph_c.body_pos)[0, :2] - block_xy)
    assert max_force > 0.5 or moved > 0.02, (max_force, moved)
