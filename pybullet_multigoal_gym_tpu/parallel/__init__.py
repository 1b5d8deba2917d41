from pybullet_multigoal_gym_tpu.parallel.mesh import (
    ENV_AXIS, make_mesh, env_sharding, replicated, shard_env_tree)
from pybullet_multigoal_gym_tpu.parallel.rollout import (
    RolloutMetrics, ShardedRollout)
from pybullet_multigoal_gym_tpu.parallel.learner import Learner, TrainState
