"""Vectorised environment front-end: jit + vmap over thousands of env
instances, TimeLimit + auto-reset semantics.

The reference has no vector env at all (one Bullet client per process,
`base_env.py:203-220`); this wrapper is the core design axis of the TPU
build. ``done`` is produced only by the TimeLimit, matching the reference
where ``env.step`` always returns ``done=False`` and the gym ``TimeLimit``
wrapper truncates (`base_env.py:138`, `__init__.py:105`).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.config import EnvConfig, env_id
from pybullet_multigoal_gym_tpu.utils import spaces

F32 = jnp.float32

# env-rows per sequential render chunk (see render_map in VecMGEnv)
_IMG_CHUNK = 256


def _make_core(cfg: EnvConfig):
    fam = cfg.family
    if fam == 'single_step':
        from pybullet_multigoal_gym_tpu.envs import single_step
        return single_step.KukaSingleStepEnv(cfg)
    if fam == 'multi_step':
        from pybullet_multigoal_gym_tpu.envs import multi_step
        return multi_step.KukaMultiBlockEnv(cfg)
    if fam == 'shape_assemble':
        from pybullet_multigoal_gym_tpu.envs import shape_assemble
        return shape_assemble.KukaPrimitiveEnv(cfg)
    from pybullet_multigoal_gym_tpu.envs import insertion
    return insertion.KukaInsertionEnv(cfg)


class VecMGEnv:
    """Batched multigoal env.

    Usage::

        env = VecMGEnv(EnvConfig(task='push'), num_envs=4096)
        state, obs = env.reset(jax.random.PRNGKey(0))
        state, obs, reward, done, info = env.step(state, actions)
    """

    def __init__(self, cfg: EnvConfig, num_envs: int = 1, auto_reset: bool = True,
                 jit: bool = True, use_pallas: Optional[bool] = None):
        cfg.validate()
        assert isinstance(num_envs, int) and num_envs >= 1, \
            'num_envs must be a positive int, got %r' % (num_envs,)
        self.cfg = cfg
        self.num_envs = num_envs
        self.auto_reset = auto_reset
        self.core = _make_core(cfg)
        self.env_id = env_id(cfg)
        self.max_episode_steps = cfg.max_episode_steps
        # batched Pallas physics: auto-on for supported families on TPU. The
        # kernel processes whole (8,128) VPU tiles (1024 envs per grid
        # program); batches >=512 that don't tile evenly are padded up to the
        # next tile internally (padding envs run normally and are sliced off
        # every output), so e.g. 512 envs/chip after mesh sharding still run
        # the kernel instead of silently dropping to the ~24x slower XLA
        # engine. Smaller batches fall back with an explicit warning.
        explicit = use_pallas is True
        if use_pallas is None:
            use_pallas = jax.default_backend() == 'tpu'
        pallas_ok = bool(use_pallas
                         and getattr(self.core, 'supports_pallas', False))
        self._n = num_envs                # internal (possibly padded) batch
        if pallas_ok and num_envs % 1024 != 0:
            if num_envs >= 512:
                self._n = -(-num_envs // 1024) * 1024
            else:
                pallas_ok = False
                if explicit:              # explicitly requested, not auto
                    import warnings
                    warnings.warn(
                        'VecMGEnv: num_envs=%d < 512 cannot use the fused '
                        'Pallas engine (1024-env VPU tiles); falling back to '
                        'the XLA engine' % num_envs)
        self.use_pallas = pallas_ok
        n = self._n

        self.pipeline = None
        if cfg.image_observation or cfg.point_cloud:
            from pybullet_multigoal_gym_tpu.render.pipeline import RenderPipeline
            self.pipeline = RenderPipeline(self.core)

        def render_map(f, tree):
            # Batched render with bounded memory: the ray-caster's live
            # temporaries are O(prims * pixels) per env (~3-4 MB), so a
            # whole-batch vmap OOMs HBM above ~512 envs/chip at 84 px.
            # lax.map over 256-env chunks serialises the render (physics
            # stays fully batched) and caps the peak at one chunk.
            rows = jax.tree_util.tree_leaves(tree)[0].shape[0]
            if rows <= _IMG_CHUNK or rows % _IMG_CHUNK != 0:
                return jax.vmap(f)(tree)
            chunked = jax.tree_util.tree_map(
                lambda x: x.reshape((rows // _IMG_CHUNK, _IMG_CHUNK)
                                    + x.shape[1:]), tree)
            out = jax.lax.map(lambda t: jax.vmap(f)(t), chunked)
            return jax.tree_util.tree_map(
                lambda x: x.reshape((rows,) + x.shape[2:]), out)

        def add_images(state, obs):
            if self.pipeline is None:
                return obs
            obs = dict(obs)
            obs['state'] = obs['observation']
            # images never feed back into the (possibly padded) state —
            # render only the user-visible rows
            img = render_map(self.pipeline.image_obs, unpad(state))
            obs.update(img)
            return obs

        is_multi_step = cfg.family == 'multi_step'
        # goal images are rendered once per episode and carried in state for
        # families whose desired_goal is fixed within an episode (the
        # reference renders goal images at reset only,
        # kuka_single_step_base_env.py:150-188); multi_step/shape_assemble
        # mutate desired_goal mid-episode (set_sub_goal, per-step regen) and
        # render fresh every step instead
        cache_goal_img = (self.pipeline is not None and cfg.goal_image
                          and cfg.family in ('single_step', 'insertion'))

        def attach_goal_img(state):       # one env, under vmap
            if not cache_goal_img:
                return state
            return state._replace(
                desired_goal_img=self.pipeline.goal_image(state))

        def attach_goal_imgs(state):      # whole batch, at reset
            if not cache_goal_img:
                return state
            # render only the visible rows; padding rows carry a repeat of
            # row 0 (their images are never observed)
            imgs = render_map(self.pipeline.goal_image, unpad(state))
            return state._replace(desired_goal_img=pad_rows(imgs))

        def unpad(tree):
            # slice padding envs off user-visible outputs (static slice)
            if n == num_envs:
                return tree
            return jax.tree_util.tree_map(lambda x: x[:num_envs], tree)

        def pad_rows(x):
            # grow a (num_envs, ...) array to the internal batch by
            # repeating row 0 (used for curriculum state of padding envs)
            if x.shape[0] == n:
                return x
            reps = jnp.broadcast_to(x[:1], (n - x.shape[0],) + x.shape[1:])
            return jnp.concatenate([x, reps], axis=0)

        def reset_fn(key, curr=None):
            keys = jax.random.split(key, n)
            if curr is not None:
                curr = jax.tree_util.tree_map(pad_rows, curr)
                state, obs = jax.vmap(self.core.reset)(keys, curr)
            else:
                state, obs = jax.vmap(self.core.reset)(keys)
            state = attach_goal_imgs(state)
            return state, unpad(add_images(state, obs))

        def step_fn(state, action):
            if action.shape[0] != n:     # caller passed the visible batch
                pad = jnp.zeros((n - action.shape[0],) + action.shape[1:],
                                action.dtype)
                action = jnp.concatenate([action, pad], axis=0)
            if self.use_pallas and cfg.primitive is not None:
                wps = jax.vmap(self.core.step_decode_waypoints)(state, action)
                phys = self.core.execute_primitive_batched(
                    state.phys, wps, n)
                state = state._replace(phys=phys, steps=state.steps + 1)
                state, obs, reward, achieved = jax.vmap(
                    self.core.step_finish)(state)
            elif self.use_pallas:
                from pybullet_multigoal_gym_tpu.ops import dynamics as _D
                state, f_t = jax.vmap(self.core.step_decode_pre)(state, action)
                if cfg.joint_control:
                    q_t = state.joint_target
                else:
                    tq = None
                    if cfg.end_effector_rotation_control:
                        from pybullet_multigoal_gym_tpu.maths import quat as _Q
                        tq = jax.vmap(_Q.euler_zyz_to_quat)(
                            state.ee_target_rot)
                    q_t = self.core.get_pallas_ik().solve(
                        state.ee_target, target_quat=tq,
                        q_init=state.phys.q,
                        rest_pose=jnp.broadcast_to(
                            jnp.asarray(self.core.rest_pose), (n, 7)))
                if cfg.has_chest:
                    door_on = state.door_hold_open
                    door_t = jnp.full((n,),
                                      cfg.chest_door_opened_state, jnp.float32)
                else:
                    door_on = jnp.zeros((n,), bool)
                    door_t = jnp.zeros((n,), jnp.float32)
                phys = self.core.get_pallas_engine().control_step(
                    state.phys, _D.Controls(
                        q_target=q_t, f_target=f_t,
                        door_motor_on=door_on, door_target=door_t))
                state = state._replace(phys=phys, steps=state.steps + 1)
                state, obs, reward, achieved = jax.vmap(
                    self.core.step_finish)(state)
            else:
                state, obs, reward, achieved = jax.vmap(self.core.step)(
                    state, action)
            obs = add_images(state, obs)
            done = state.steps >= cfg.max_episode_steps
            info = {'goal_achieved': achieved}
            if auto_reset:
                def do_reset(s):
                    new_key, sub = jax.random.split(s.key)
                    # curriculum bookkeeping persists across episodes
                    # (reference instance attributes)
                    if is_multi_step:
                        ns, _ = self.core.reset(
                            sub, (s.curriculum_prob, s.goals_generated,
                                  s.curriculum_update))
                    else:
                        ns, _ = self.core.reset(sub)
                    return attach_goal_img(ns._replace(key=new_key))

                def apply_resets(state):
                    reset_states = jax.vmap(do_reset)(state)
                    return jax.tree_util.tree_map(
                        lambda r, s: jnp.where(
                            done.reshape(done.shape + (1,) * (s.ndim - 1)),
                            r, s),
                        reset_states, state)

                # `done` comes only from the TimeLimit, so episodes step in
                # lockstep and reset-work is needed on ~1/max_episode_steps
                # of the calls — a real branch (lax.cond), not a select,
                # skips the whole resample/goal-render computation on every
                # other step
                state = jax.lax.cond(jnp.any(done), apply_resets,
                                     lambda s: s, state)
            obs, reward, done, info = unpad((obs, reward, done, info))
            return state, obs, reward, done, info

        self._reset = jax.jit(reset_fn) if jit else reset_fn
        self._step = jax.jit(step_fn) if jit else step_fn

    # ------------------------------------------------------------------- api
    def reset(self, key, curr=None):
        if curr is not None:
            return self._reset(key, curr)
        return self._reset(key)

    def step(self, state, action):
        return self._step(state, action)

    @property
    def action_space(self):
        cfg = self.cfg
        if cfg.primitive == 'discrete_push':
            # MultiDiscrete([20, W, H]) (kuka.py:89-97)
            w = self.core.action_map_width
            h = self.core.action_map_height
            return spaces.MultiDiscrete((20, w, h))
        return spaces.Box.unit(cfg.action_dim)

    def observation_space(self, obs):
        """Build a Dict space from a sample obs, mirroring
        `base_env.py:86-110` (including its `state` key quirk: the reference
        names the first key `state` but sizes it from obs['observation'])."""
        d = {}
        for k, v in obs.items():
            if isinstance(v, dict):
                continue
            d[k] = spaces.Box.unbounded(np.asarray(v).shape[1:] or (1,))
        return spaces.Dict(d)


def make_vec_env(num_envs: int = 1, **kwargs) -> VecMGEnv:
    cfg_fields = {f for f in EnvConfig.__dataclass_fields__}
    cfg_kwargs = {k: v for k, v in kwargs.items() if k in cfg_fields}
    rest = {k: v for k, v in kwargs.items() if k not in cfg_fields}
    # accept the reference's list-of-dicts camera format like make_env does
    # (EnvConfig itself stores the frozen hashable tuple form)
    cs = cfg_kwargs.get('camera_setup')
    if cs is not None and not isinstance(cs, tuple):
        cfg_kwargs['camera_setup'] = EnvConfig.freeze_camera_setup(cs)
    cfg = EnvConfig(**cfg_kwargs)
    return VecMGEnv(cfg, num_envs=num_envs, **rest)
