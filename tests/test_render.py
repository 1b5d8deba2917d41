"""Renderer tests: static-kind dispatch parity and image-obs contract.

raster.trace groups primitives by their (config-static) kind and runs one
intersector per group; these tests pin that fast path against the dynamic
jnp.select path and check the image-observation plumbing end-to-end at a
small resolution (the reference's capability being replaced:
base_env.py:140-168)."""

import jax
import jax.numpy as jnp
import numpy as np

import pybullet_multigoal_gym_tpu as pmg  # noqa: F401
from pybullet_multigoal_gym_tpu.render import camera as C
from pybullet_multigoal_gym_tpu.render import raster


def _soup():
    kinds = [raster.BOX, raster.SPHERE, raster.CYLINDER, raster.CAPSULE,
             raster.BOX]
    P = len(kinds)
    key = jax.random.PRNGKey(0)
    pos = jnp.array([[0.0, 0.0, 0.1], [0.15, 0.0, 0.1], [-0.15, 0.0, 0.1],
                     [0.0, 0.15, 0.1], [0.0, -0.15, 0.05]], jnp.float32)
    rot = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (P, 1))
    size = jnp.array([[0.05, 0.05, 0.05], [0.06, 0, 0], [0.04, 0.05, 0],
                      [0.03, 0.04, 0], [0.2, 0.2, 0.01]], jnp.float32)
    color = jax.random.uniform(key, (P, 3), jnp.float32, 0.2, 1.0)
    visible = jnp.ones((P,), bool)
    return kinds, pos, rot, size, color, visible


def test_static_trace_matches_dynamic():
    kinds, pos, rot, size, color, visible = _soup()
    V = C.view_matrix([0.5, 0.4, 0.6], [0.0, 0.0, 0.1], [0, 0, 1])
    P_m = C.projection_matrix_fov(aspect=1.0)
    origins, dirs = C.pixel_rays(32, 32, V, P_m)

    static = raster.Prims(kind=jnp.asarray(kinds, jnp.int32), pos=pos,
                          rot=rot, size=size, color=color, visible=visible)
    c1, p1, h1 = raster.trace(static, origins, dirs)

    # force the dynamic path by tracing the kinds through jit
    def dyn(kind_arr):
        prims = raster.Prims(kind=kind_arr, pos=pos, rot=rot, size=size,
                             color=color, visible=visible)
        return raster.trace(prims, origins, dirs)

    c2, p2, h2 = jax.jit(dyn)(jnp.asarray(kinds, jnp.int32))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-3)
    assert bool(np.asarray(h1).any())        # the soup is actually visible


def test_image_observation_contract_small():
    camera_setup = [{
        'cameraEyePosition': [-0.9, 0.0, 0.4],
        'cameraTargetPosition': [-0.45, 0.0, 0.0],
        'cameraUpVector': [0, 0, 1],
        'render_width': 32, 'render_height': 32,
    }]
    env = pmg.make_env(task='push', image_observation=True, depth_image=True,
                       goal_image=True, camera_setup=camera_setup,
                       max_episode_steps=5)
    obs = env.reset()
    assert obs['observation'].shape == (32, 32, 4)      # rgbd
    assert obs['desired_goal_img'].shape == (32, 32, 4)
    assert obs['state'].ndim == 1
    img = np.asarray(obs['observation'])
    assert img.dtype == np.uint8
    assert img[..., :3].std() > 1.0          # not a constant image
    obs, r, d, i = env.step(np.zeros(4, np.float32))
    assert obs['observation'].shape == (32, 32, 4)


def test_goal_image_cached_per_episode():
    """Single-step goals are episode-constant, so the desired-goal image is
    rendered once per reset and carried in state (vec_env.attach_goal_img),
    matching the reference's render-at-reset (`kuka_single_step_base_env.py:
    150-188`) instead of paying a render + IK solve every step."""
    env = pmg.make_vec_env(num_envs=2, task='push', max_episode_steps=2,
                           image_observation=True, goal_image=True,
                           render_width=16, render_height=16)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert state.desired_goal_img is not None
    fresh = jax.vmap(env.pipeline.goal_image)(state)
    np.testing.assert_array_equal(np.asarray(obs['desired_goal_img']),
                                  np.asarray(fresh))
    a = np.zeros((2, env.cfg.action_dim), np.float32)
    s1, o1, *_ = env.step(state, a)
    # unchanged mid-episode
    np.testing.assert_array_equal(np.asarray(o1['desired_goal_img']),
                                  np.asarray(obs['desired_goal_img']))
    s2, o2, r2, d2, _ = env.step(s1, a)
    assert bool(np.asarray(d2).all())       # TimeLimit -> auto-reset
    # the re-rendered cache belongs to the NEW episode's goal
    fresh2 = jax.vmap(env.pipeline.goal_image)(s2)
    np.testing.assert_array_equal(np.asarray(s2.desired_goal_img),
                                  np.asarray(fresh2))


def test_auto_reset_cond_skips_and_fires():
    """TimeLimit `done` is batch-uniform, so auto-reset runs under a real
    lax.cond branch: no-reset steps keep state, the boundary step resets
    every env (steps counter back to 0, fresh episode thereafter)."""
    env = pmg.make_vec_env(num_envs=3, task='reach', max_episode_steps=2)
    st, _ = env.reset(jax.random.PRNGKey(1))
    a = np.zeros((3, env.cfg.action_dim), np.float32)
    st, *_ = env.step(st, a)
    goals_ep1 = np.asarray(st.desired_goal)
    st, _, _, d, _ = env.step(st, a)
    assert bool(np.asarray(d).all())
    assert int(np.asarray(st.steps).max()) == 0      # reset applied
    assert (np.asarray(st.desired_goal) != goals_ep1).any()  # resampled
    st, _, _, d, _ = env.step(st, a)
    assert not bool(np.asarray(d).any())
    assert int(np.asarray(st.steps).min()) == 1


def test_chunked_render_matches_vmap(monkeypatch):
    """render_map (lax.map over 256-env chunks, the HBM-bounded image path
    for large batches) must produce bitwise-identical images to a plain
    whole-batch vmap."""
    from pybullet_multigoal_gym_tpu.config import EnvConfig
    from pybullet_multigoal_gym_tpu.envs import vec_env as V

    cfg = EnvConfig(task='push', image_observation=True, goal_image=True,
                    depth_image=True, render_width=16, render_height=16,
                    max_episode_steps=10)
    key = jax.random.PRNGKey(0)
    act = jnp.zeros((8, 4), jnp.float32)

    monkeypatch.setattr(V, '_IMG_CHUNK', 4)       # 8 envs -> 2 chunks
    env = V.VecMGEnv(cfg, num_envs=8, use_pallas=False)
    _, o_reset = env._reset(key)
    s, _ = env._reset(key)
    _, o_chunk, _, _, _ = env._step(s, act)

    monkeypatch.setattr(V, '_IMG_CHUNK', 1 << 30)  # plain vmap
    env2 = V.VecMGEnv(cfg, num_envs=8, use_pallas=False)
    s2, _ = env2._reset(key)
    _, o_vmap, _, _, _ = env2._step(s2, act)

    for k in ('images', 'achieved_goal_img', 'desired_goal_img'):
        a, b = np.asarray(o_chunk[k]), np.asarray(o_vmap[k])
        assert a.shape == b.shape and np.array_equal(a, b), k
    # non-image obs only differ by XLA scheduling noise between programs
    np.testing.assert_allclose(np.asarray(o_chunk['observation']),
                               np.asarray(o_vmap['observation']), atol=1e-5)
