"""Oracle tests for the curriculum staircase and sub-goal schedules.

The vectorised implementations in envs/multi_step.py are nontrivial rewrites
of branchy, stateful reference code. Each oracle below is a straight-line
NumPy port of the corresponding reference routine (file:line cited per
oracle); the tests drive both through thousands of simulated goal-count
trajectories / random scene layouts and assert exact agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.envs import multi_step as MS
from pybullet_multigoal_gym_tpu.envs.vec_env import _make_core


# --------------------------------------------------------------------------
# Oracle: curriculum probability staircase
# (`kuka_multi_step_base_env.py:350-379`, straight-line)
# --------------------------------------------------------------------------
def oracle_update_prob(prob, counts, per, nc):
    prob = prob.copy()
    finished = counts >= per
    half = counts >= per / 2
    prob[finished] = 0.0
    if half[0] and not finished[0]:
        prob[0] = 0.5
        prob[1] = 0.5
    for i in range(1, nc - 1):
        if finished[i - 1] and not finished[i]:
            if half[i]:
                prob[i] = 0.5
                prob[i + 1] = 0.5
            else:
                prob[i] = 1.0
    if finished[-2]:
        prob[-1] = 1.0
    return prob


@pytest.mark.parametrize('nc,per', [(2, 4), (3, 6), (5, 8), (6, 10)])
def test_curriculum_prob_staircase_matches_oracle(nc, per):
    """Run a full simulated curriculum: draw levels from the oracle's prob,
    increment counters, update both implementations, compare at every step."""
    fn = jax.jit(lambda p, c: MS.update_curriculum_prob(p, c, nc, float(per)),
                 backend=None)
    rng = np.random.default_rng(nc * 100 + per)
    prob_o = np.zeros(nc, np.float32)
    prob_o[0] = 1.0
    prob_v = prob_o.copy()
    counts = np.zeros(nc, np.float32)
    total = nc * per + 10
    for t in range(total):
        p = prob_o / prob_o.sum() if prob_o.sum() > 0 else None
        if p is None:
            break
        level = rng.choice(nc, p=p)
        counts[level] += 1
        prob_o = oracle_update_prob(prob_o, counts, per, nc)
        prob_v = np.asarray(fn(jnp.asarray(prob_v), jnp.asarray(counts)))
        np.testing.assert_array_equal(prob_v, prob_o,
                                      err_msg=f't={t} counts={counts}')


def test_curriculum_prob_random_states_match_oracle():
    """Beyond reachable trajectories: random (prob, counts) pairs."""
    nc, per = 5, 8
    rng = np.random.default_rng(0)
    for _ in range(200):
        prob = rng.choice([0.0, 0.5, 1.0], nc).astype(np.float32)
        counts = rng.integers(0, per + 3, nc).astype(np.float32)
        want = oracle_update_prob(prob, counts, per, nc)
        got = np.asarray(MS.update_curriculum_prob(
            jnp.asarray(prob), jnp.asarray(counts), nc, float(per)))
        np.testing.assert_array_equal(got, want)


# --------------------------------------------------------------------------
# Oracle: block-stack sub-goal schedule
# (`KukaBlockStackEnv._generate_subgoals`, kuka_multi_step_envs.py:89-122)
# --------------------------------------------------------------------------
def oracle_stack_subgoals(block_poses, target_xyzs, order, nb, grip):
    subs = []
    for k in range(nb):
        def blocks(upto):
            out = np.zeros((nb, 3))
            for i in range(nb):
                out[order[i]] = (target_xyzs[i] if i < upto
                                 else block_poses[order[i]])
            return out.reshape(-1)
        if grip:
            subs.append(np.concatenate(
                [blocks(k), block_poses[order[k]], [0.03]]))
            subs.append(np.concatenate(
                [blocks(k + 1), target_xyzs[k], [0.03]]))
        else:
            subs.append(blocks(k + 1))
    return np.stack(subs)


@pytest.fixture(scope='module')
def stack_core():
    return _make_core(EnvConfig(task='block_stack', num_block=3,
                                task_decomposition=True,
                                grip_informed_goal=True))


@pytest.fixture(scope='module')
def stack_core_nogrip():
    return _make_core(EnvConfig(task='block_stack', num_block=3,
                                task_decomposition=True))


@pytest.mark.parametrize('grip', [True, False])
def test_stack_subgoals_match_oracle(grip, stack_core, stack_core_nogrip):
    core = stack_core if grip else stack_core_nogrip
    nb = 3
    rng = np.random.default_rng(7)
    for trial in range(20):
        poses = rng.uniform(-0.6, -0.4, (nb, 3)).astype(np.float32)
        targets = rng.uniform(-0.6, -0.4, (nb, 3)).astype(np.float32)
        order = rng.permutation(nb).astype(np.int32)
        got = np.asarray(core._stack_subgoals(
            jnp.asarray(poses), jnp.asarray(targets), jnp.asarray(order)))
        want = oracle_stack_subgoals(poses, targets, order, nb, grip)
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f'{trial}')


# --------------------------------------------------------------------------
# Oracle: chest sub-goal schedules
# (chest pick: kuka_multi_step_envs.py:289-340; push: :437-481)
# --------------------------------------------------------------------------
def oracle_chest_subgoals(block_poses, center, top, tip, closeness,
                          door_open, nb, pick, grip):
    subs = []
    first = [[door_open]] + [p for p in block_poses]
    if grip:
        first += ([tip, closeness] if pick else [tip])
    subs.append(np.concatenate(first))
    if grip:
        for k in range(nb):
            def blocks(strict_upto, also=None):
                out = [p.copy() for p in block_poses]
                for i in range(nb):
                    if i < strict_upto:
                        out[i] = center.copy()
                if also is not None:
                    out[also[0]] = also[1].copy()
                return out
            if pick:
                subs.append(np.concatenate(
                    [[door_open]] + blocks(k) + [block_poses[k], [0.03]]))
                subs.append(np.concatenate(
                    [[door_open]] + blocks(k, (k, top)) + [top, [0.03]]))
                subs.append(np.concatenate(
                    [[door_open]] + blocks(k, (k, center)) + [top, [0.06]]))
            else:
                reach_g = block_poses[k].copy()
                reach_g[0] += 0.03
                subs.append(np.concatenate(
                    [[door_open]] + blocks(k) + [reach_g]))
                push_g = center.copy()
                push_g[0] += 0.03
                subs.append(np.concatenate(
                    [[door_open]] + blocks(k, (k, center)) + [push_g]))
    else:
        for k in range(nb):
            subs.append(np.concatenate(
                [[door_open]] + [center if i <= k else block_poses[i]
                                 for i in range(nb)]))
    return np.stack(subs)


@pytest.mark.parametrize('task,pick,grip', [
    ('chest_pick_and_place', True, True),
    ('chest_push', False, True),
    ('chest_push', False, False),
])
def test_chest_subgoals_match_oracle(task, pick, grip):
    nb = 2
    core = _make_core(EnvConfig(task=task, num_block=nb,
                                task_decomposition=True,
                                grip_informed_goal=grip))
    center = np.asarray(core.chest_center)
    top = np.asarray(core.chest_top)
    door_open = 0.10 if pick else 0.12
    rng = np.random.default_rng(11)
    for trial in range(20):
        poses = rng.uniform(-0.6, -0.4, (nb, 3)).astype(np.float32)
        tip = rng.uniform(-0.6, -0.4, 3).astype(np.float32)
        closeness = rng.uniform(0.0, 0.07, 1).astype(np.float32)
        got = np.asarray(core._chest_subgoals(
            jnp.asarray(poses), jnp.asarray(tip), jnp.asarray(closeness),
            door_open, pick))
        want = oracle_chest_subgoals(poses, center, top, tip, closeness,
                                     door_open, nb, pick, grip)
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f'{trial}')


# --------------------------------------------------------------------------
# Oracle: curriculum desired-goal composition
# (stack: kuka_multi_step_envs.py:124-148; rearrange: :202-227;
#  chest: :342-377 / :483-517)
# --------------------------------------------------------------------------
def test_stack_curriculum_goal_matches_oracle():
    nb = 3
    core = _make_core(EnvConfig(task='block_stack', num_block=nb,
                                use_curriculum=True,
                                grip_informed_goal=True,
                                num_goals_to_generate=30))
    state, _ = core.reset(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    for level in range(nb):
        poses = rng.uniform(-0.6, -0.4, (nb, 3)).astype(np.float32)
        targets = rng.uniform(-0.6, -0.4, (nb, 3)).astype(np.float32)
        order = rng.permutation(nb).astype(np.int32)
        st = state._replace(curriculum_level=jnp.asarray(level, jnp.int32),
                            target_xyzs=jnp.asarray(targets),
                            block_order=jnp.asarray(order))
        st = core._goal_block_stack(st, jnp.asarray(poses),
                                    new_target=False, key=None)
        got = np.asarray(st.desired_goal)
        # oracle (kuka_multi_step_envs.py:139-148)
        want = np.zeros((nb, 3))
        for i in range(nb):
            want[order[i]] = targets[i] if i <= level else poses[order[i]]
        want = np.concatenate([want.reshape(-1), targets[level], [0.03]])
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f'L{level}')


def test_rearrange_curriculum_goal_matches_oracle():
    nb = 4
    core = _make_core(EnvConfig(task='block_rearrange', num_block=nb,
                                use_curriculum=True,
                                num_goals_to_generate=40))
    state, _ = core.reset(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    for trial in range(20):
        poses = rng.uniform(-0.6, -0.4, (nb, 3)).astype(np.float32)
        targets = rng.uniform(-0.6, -0.4, (nb, 3)).astype(np.float32)
        k = int(rng.integers(1, nb + 1))
        mask = np.zeros(nb, bool)
        mask[rng.choice(nb, size=k, replace=False)] = True
        st = state._replace(target_xyzs=jnp.asarray(targets),
                            ind_block_to_move=jnp.asarray(mask))
        st = core._goal_block_rearrange(st, jnp.asarray(poses),
                                        new_target=False, key=None)
        got = np.asarray(st.desired_goal).reshape(nb, 3)
        # oracle (kuka_multi_step_envs.py:221-227): the j-th smallest moved
        # index consumes target j
        want = poses.copy()
        j = 0
        for i in range(nb):
            if mask[i]:
                want[i] = targets[j]
                j += 1
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f'{trial}')


def test_chest_curriculum_goal_matches_oracle():
    nb = 3
    core = _make_core(EnvConfig(task='chest_pick_and_place', num_block=nb,
                                use_curriculum=True,
                                grip_informed_goal=True,
                                num_goals_to_generate=40))
    state, _ = core.reset(jax.random.PRNGKey(0))
    center = np.asarray(core.chest_center)
    top = np.asarray(core.chest_top)
    rng = np.random.default_rng(9)
    for level in range(nb + 1):
        poses = rng.uniform(-0.6, -0.4, (nb, 3)).astype(np.float32)
        tip = rng.uniform(-0.6, -0.4, 3).astype(np.float32)
        closeness = rng.uniform(0.0, 0.07, 1).astype(np.float32)
        mask = np.zeros(nb, bool)
        mask[rng.choice(nb, size=level, replace=False)] = True
        st = state._replace(curriculum_level=jnp.asarray(level, jnp.int32),
                            ind_block_to_move=jnp.asarray(mask))
        st = core._goal_chest(st, jnp.asarray(poses), new_target=False,
                              key=None, gripper_xyz=jnp.asarray(tip),
                              finger_closeness=jnp.asarray(closeness),
                              door_open=0.10, pick=True)
        got = np.asarray(st.desired_goal)
        # oracle (kuka_multi_step_envs.py:360-377)
        blocks = [center if mask[i] else poses[i] for i in range(nb)]
        if level == 0:
            grip_part = [tip, closeness]
        else:
            grip_part = [top, [0.06]]
        want = np.concatenate([[0.10]] + blocks + grip_part)
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f'L{level}')
