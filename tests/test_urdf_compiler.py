"""Native URDF compiler tests: the C++ extractor (native/urdf_compiler.cpp)
must reproduce the framework's checked-in compiled model constants from the
reference URDF sources — making the shipped constants machine-verified."""

import os
import shutil

import numpy as np
import pytest

ASSETS = '/root/reference/pybullet_multigoal_gym/assets'

pytestmark = pytest.mark.skipif(
    shutil.which('g++') is None or not os.path.isdir(ASSETS),
    reason='needs g++ toolchain and reference assets')


@pytest.fixture(scope='module')
def kuka_model():
    from pybullet_multigoal_gym_tpu.model.urdf_compiler import compile_urdf
    return compile_urdf(os.path.join(
        ASSETS, 'robots/kuka/iiwa14_parallel_jaw.urdf'))


def test_arm_joint_origins_match_constants(kuka_model):
    from pybullet_multigoal_gym_tpu.model import kuka_model as KM
    joints = {j['name']: j for j in kuka_model['joints']}
    for i in range(7):
        j = joints['iiwa_joint_%d' % (i + 1)]
        assert j['type'] == 'revolute'
        np.testing.assert_allclose(j['origin_xyz'], KM.JOINT_ORIGIN_XYZ[i],
                                   atol=1e-9)
        np.testing.assert_allclose(j['origin_rpy'], KM.JOINT_ORIGIN_RPY[i],
                                   atol=1e-5)
        np.testing.assert_allclose(j['axis'], [0, 0, 1])
        np.testing.assert_allclose(j['limit']['lower'],
                                   KM.JOINT_LIMIT_LOWER[i], atol=1e-6)
        assert j['limit']['effort'] == KM.JOINT_EFFORT
        assert j['damping'] == KM.JOINT_DAMPING


def test_finger_joints_match_constants(kuka_model):
    from pybullet_multigoal_gym_tpu.model import kuka_model as KM
    joints = {j['name']: j for j in kuka_model['joints']}
    for f in range(2):
        j = joints['iiwa_gripper_finger%d_joint' % (f + 1)]
        assert j['type'] == 'prismatic'
        np.testing.assert_allclose(j['origin_xyz'], KM.FINGER_ORIGIN[f])
        np.testing.assert_allclose(j['axis'], KM.FINGER_AXIS[f])
        assert j['limit']['upper'] == KM.FINGER_LIMIT
        assert j['limit']['effort'] == KM.FINGER_EFFORT


def test_tip_offset_matches(kuka_model):
    from pybullet_multigoal_gym_tpu.model import kuka_model as KM
    joints = {j['name']: j for j in kuka_model['joints']}
    np.testing.assert_allclose(joints['iiwa_gripper_tip_joint']['origin_xyz'],
                               KM.TIP_OFFSET)


def test_block_urdf_matches_scene(kuka_model):
    from pybullet_multigoal_gym_tpu.model.urdf_compiler import compile_urdf
    from pybullet_multigoal_gym_tpu.ops import scene as S
    m = compile_urdf(os.path.join(ASSETS, 'objects/block.urdf'))
    link = m['links'][0]
    assert link['mass'] == S.BLOCK_MASS
    assert link['contact']['inertia_scaling'] == S.INERTIA_SCALING
    col = link['collisions'][0]
    np.testing.assert_allclose(np.asarray(col['size']) / 2.0,
                               [S.BLOCK_HALF] * 3)


def test_slide_puck_matches_scene():
    from pybullet_multigoal_gym_tpu.model.urdf_compiler import compile_urdf
    m = compile_urdf(os.path.join(ASSETS, 'objects/cylinder_bulk.urdf'))
    col = m['links'][0]['collisions'][0]
    assert col['type'] == 'cylinder'
    np.testing.assert_allclose([col['radius'], col['length']], [0.03, 0.02])


def test_ee_subtree_mass_matches_urdf(kuka_model):
    """The joint-7 force-sensor gravity load (envs/robot.py) must equal the
    summed URDF mass of everything distal of the sensor."""
    from pybullet_multigoal_gym_tpu.model import kuka_model as KM
    links = {l['name']: l for l in kuka_model['links']}
    distal = ['iiwa_link_7', 'iiwa_gripper_base_link',
              'iiwa_gripper_finger1', 'iiwa_gripper_finger2']
    m = sum(links[n]['mass'] for n in distal)
    np.testing.assert_allclose(m, KM.EE_SUBTREE_MASS, rtol=1e-9)


def test_robotiq_mimic_multipliers():
    from pybullet_multigoal_gym_tpu.model import kuka_model as KM
    from pybullet_multigoal_gym_tpu.model.urdf_compiler import compile_urdf
    m = compile_urdf(os.path.join(ASSETS, 'robots/kuka/iiwa14_robotiq85.urdf'))
    joints = {j['name']: j for j in m['joints']}
    main = joints['iiwa_gripper_finger1_joint']
    assert abs(main['limit']['upper'] - KM.ROBOTIQ_JOINT_LIMIT) < 1e-9
    mimics = [j for j in m['joints'] if 'mimic' in j]
    mults = sorted(j['mimic']['multiplier'] for j in mimics)
    # the URDF carries 4 <mimic> tags (inner knuckles +1, finger tips -1);
    # finger2 is driven in code with the [1,1,1,-1,1,-1] multiplier array
    # (kuka.py:54-65), not via a mimic tag
    assert mults.count(-1.0) == 2 and mults.count(1.0) == 2, mults
    assert joints['iiwa_gripper_finger2_joint']['limit']['upper'] == \
        joints['iiwa_gripper_finger1_joint']['limit']['upper']
