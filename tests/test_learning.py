"""End-to-end learning: DDPG-HER trains reach to high success on one chip.

The reference suite exists to serve DDPG-HER agents
(`/root/reference/README.md:18-21`); this is the machine check that the
TPU-native env + learner actually close that loop: sparse binary reward,
HER 'future' relabelling from the on-device episode buffer, target
networks, vectorised envs — >90% deterministic-policy success on reach.
"""

import jax
import numpy as np
import pytest

from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.envs.vec_env import VecMGEnv
from pybullet_multigoal_gym_tpu.parallel.learner import Learner


@pytest.mark.slow
def test_reach_her_learns():
    venv = VecMGEnv(EnvConfig(task='reach'), num_envs=256, auto_reset=False,
                    jit=False)
    learner = Learner(venv, hidden=256, lr=1e-3, gamma=0.98, polyak=0.95)
    ts = learner.init(jax.random.PRNGKey(0))

    epoch = jax.jit(lambda ts, k: learner.train_epoch(
        ts, k, n_updates=40, batch_size=4096))
    evaluate = jax.jit(learner.eval_success)

    key = jax.random.PRNGKey(1)
    success = 0.0
    for ep in range(60):
        key, k = jax.random.split(key)
        ts, metrics = epoch(ts, k)
        if ep >= 10 and (ep + 1) % 5 == 0:
            success = float(evaluate(ts, jax.random.fold_in(key, 777)))
            if success > 0.9:
                break
    assert success > 0.9, 'reach HER success plateaued at %.2f' % success
