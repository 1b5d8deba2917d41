"""make_env factory / env-id / validation tests (reference __init__.py:4-178)."""

import numpy as np
import pytest

import pybullet_multigoal_gym_tpu as pmg
from pybullet_multigoal_gym_tpu.config import EnvConfig, env_id
from pybullet_multigoal_gym_tpu.utils.demonstrator import StepDemonstrator


def test_env_id_scheme():
    assert env_id(EnvConfig(task='reach')) == \
        'KukaReachParallelGripSparseReward-v0'
    assert env_id(EnvConfig(task='push', binary_reward=False,
                            gripper='robotiq85')) == \
        'KukaPushRobotiq85GripDenseReward-v0'
    assert env_id(EnvConfig(task='pick_and_place', joint_control=True)) == \
        'KukaPickAndPlaceParallelGripSparseRewardJointCtrl-v0'
    assert env_id(EnvConfig(task='slide'), render=True) == \
        'KukaSlideParallelGripRenderSparseReward-v0'


def test_invalid_task_rejected():
    with pytest.raises(AssertionError):
        EnvConfig(task='fly').validate()


def test_invalid_gripper_rejected():
    with pytest.raises(AssertionError):
        EnvConfig(gripper='suction').validate()


def test_too_many_blocks_rejected():
    with pytest.raises(AssertionError):
        EnvConfig(task='block_stack', num_block=6).validate()


def test_slide_image_obs_rejected():
    with pytest.raises(AssertionError):
        pmg.make_env(task='slide', image_observation=True)


def test_block_rearrange_decomposition_rejected():
    with pytest.raises(AssertionError):
        EnvConfig(task='block_rearrange', task_decomposition=True,
                  grip_informed_goal=False).validate()


def test_primitive_type_required():
    with pytest.raises(AssertionError):
        EnvConfig(task='primitive_push_assemble', primitive=None).validate()


def test_action_dims():
    assert EnvConfig(task='reach').action_dim == 3
    assert EnvConfig(task='pick_and_place').action_dim == 4
    assert EnvConfig(task='reach', joint_control=True).action_dim == 7
    assert EnvConfig(task='pick_and_place', joint_control=True).action_dim == 8
    assert EnvConfig(task='insertion').action_dim == 7


def test_step_demonstrator():
    """StepDemonstrator cycling semantics (utils/demonstrator.py)."""
    d = StepDemonstrator([[0], [0, 1], [0, 1, 2]])
    d.manual_reset(2)
    assert d.get_next_goal() == 0
    assert d.get_next_goal() == 1
    assert d.get_next_goal() == 2
    # sticks at the final goal
    assert d.get_next_goal() == 2
