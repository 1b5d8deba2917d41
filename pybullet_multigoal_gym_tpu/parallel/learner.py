"""On-device goal-conditioned DDPG-HER learner.

The reference repo ships no learning code (its DDPG-HER agents live in a
separate repo, `/root/reference/README.md:18-21`) but exists to SERVE that
algorithm; this module makes the framework's training story end-to-end real:

* `train_step` — one fused env-interaction + TD-update step with TARGET
  networks, jit/shard-able over the `('env',)` mesh (used by the multichip
  dryrun: sharded env physics + actor/critic fwd/bwd + data-parallel grad
  reduction in one program).
* `train_epoch` — full DDPG-HER training: collect a whole episode batch with
  `lax.scan`, keep it resident on-device, then run minibatch updates with
  HER 'future' goal relabelling (arXiv:1707.01495) sampled directly from the
  on-device trajectory buffer. `tests/test_learning.py` trains reach to
  >90% success on one chip with it.

Data-parallel only — there is no tensor/pipeline/sequence/expert
parallelism analog for a robotics env suite (SURVEY.md §2.4); the policy
MLPs are tiny and replicated, the env batch is the sharded axis, and XLA
turns the batch-mean gradients below into `psum` over ICI.
"""

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

F32 = jnp.float32


def _mlp_init(key, sizes: Sequence[int]):
    params = []
    for i in range(len(sizes) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        w = jax.random.normal(k1, (sizes[i], sizes[i + 1]), F32)
        w = w * jnp.sqrt(2.0 / sizes[i])
        b = jnp.zeros((sizes[i + 1],), F32)
        params.append((w, b))
    return params


def _mlp_apply(params, x):
    for i, (w, b) in enumerate(params):
        x = x @ w + b
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


class ACParams(NamedTuple):
    actor: list
    critic: list


class TrainState(NamedTuple):
    params: ACParams
    target: ACParams          # polyak-averaged target networks
    opt_state: optax.OptState


class Learner:
    """Goal-conditioned DDPG-HER learner over a vectorised env.

    obs -> concat(policy_state, desired_goal) feeds the actor; the critic
    additionally takes the action.
    """

    def __init__(self, venv, hidden: int = 64, lr: float = 1e-3,
                 gamma: float = 0.98, polyak: float = 0.95,
                 her_future_p: float = 0.8, action_l2: float = 0.5):
        self.venv = venv
        self.cfg = venv.cfg
        self.gamma = gamma
        self.polyak = polyak
        self.her_future_p = her_future_p
        self.action_l2 = action_l2
        self.hidden = hidden
        self.tx = optax.adam(lr)

        # policy input dim from an eval_shape probe (no device work)
        obs_struct = jax.eval_shape(lambda k: venv._reset(k)[1],
                                    jax.random.PRNGKey(0))
        self.goal_dim = obs_struct['desired_goal'].shape[-1]
        self.ps_dim = obs_struct['policy_state'].shape[-1]
        self.obs_dim = self.ps_dim + self.goal_dim
        self.act_dim = self.cfg.action_dim

    def init(self, key) -> TrainState:
        k1, k2 = jax.random.split(key)
        params = ACParams(
            actor=_mlp_init(k1, [self.obs_dim, self.hidden, self.hidden,
                                 self.act_dim]),
            critic=_mlp_init(k2, [self.obs_dim + self.act_dim, self.hidden,
                                  self.hidden, 1]))
        return TrainState(params=params, target=params,
                          opt_state=self.tx.init(params))

    # ------------------------------------------------------------------ parts
    def _pi(self, params: ACParams, ps, g, key=None, noise: float = 0.0):
        a = jnp.tanh(_mlp_apply(params.actor, jnp.concatenate([ps, g], -1)))
        if key is not None and noise > 0:
            a = jnp.clip(a + noise * jax.random.normal(key, a.shape, F32),
                         -1.0, 1.0)
        return a

    def _q(self, params: ACParams, ps, g, act):
        x = jnp.concatenate([ps, g, act], -1)
        return _mlp_apply(params.critic, x)[..., 0]

    def policy(self, params: ACParams, obs, key=None, noise: float = 0.0):
        return self._pi(params, obs['policy_state'], obs['desired_goal'],
                        key, noise)

    def q_value(self, params: ACParams, obs, act):
        return self._q(params, obs['policy_state'], obs['desired_goal'], act)

    def _clip_target(self, t):
        """Sparse-reward returns live in [-1/(1-gamma), 0] (HER trick)."""
        if self.cfg.binary_reward:
            return jnp.clip(t, -1.0 / (1.0 - self.gamma), 0.0)
        return t

    def _polyak(self, target: ACParams, params: ACParams) -> ACParams:
        return jax.tree_util.tree_map(
            lambda t, p: self.polyak * t + (1.0 - self.polyak) * p,
            target, params)

    # ------------------------------------------------------------- train step
    def train_step(self, ts: TrainState, env_state, key):
        """One fused env-interaction + TD-update step (target networks,
        1-step TD). Jit/shard this — the multichip dryrun does."""
        k_act, k_next = jax.random.split(key)
        obs = self._obs_of(env_state)
        act = self.policy(ts.params, obs, k_act, noise=0.1)
        env_state, next_obs, reward, done, info = self.venv._step(env_state, act)

        def loss_fn(params):
            next_a = self.policy(ts.target, next_obs)
            target = reward + self.gamma * self.q_value(ts.target, next_obs,
                                                        next_a)
            target = jax.lax.stop_gradient(self._clip_target(target))
            q = self.q_value(params, obs, act)
            critic_loss = jnp.mean((q - target) ** 2)
            pi = self.policy(params, obs)
            actor_loss = -jnp.mean(self.q_value(
                jax.lax.stop_gradient(params), obs, pi)) \
                + self.action_l2 * jnp.mean(pi ** 2)
            return critic_loss + actor_loss, (critic_loss, q)

        grads, (critic_loss, q) = jax.grad(loss_fn, has_aux=True)(ts.params)
        updates, opt_state = self.tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        metrics = {'critic_loss': critic_loss, 'mean_q': jnp.mean(q),
                   'mean_reward': jnp.mean(reward),
                   'success': jnp.mean(info['goal_achieved'].astype(F32))}
        return TrainState(params, self._polyak(ts.target, params),
                          opt_state), env_state, metrics

    def _obs_of(self, env_state):
        core = self.venv.core
        n = self.venv.num_envs
        if getattr(self.venv, '_n', n) != n:
            # internally tile-padded batch (vec_env.py): act/learn on the
            # visible rows only — venv._step re-pads actions itself and
            # returns unpadded outputs
            env_state = jax.tree_util.tree_map(lambda x: x[:n], env_state)
        if self.cfg.family == 'single_step':
            return jax.vmap(core._get_obs)(env_state)
        return jax.vmap(lambda s: core._get_obs(s)[0])(env_state)

    # ------------------------------------------------------- episodic DDPG-HER
    def collect_episode(self, ts: TrainState, key, noise: float = 0.2,
                        random_eps: float = 0.3):
        """Roll one full episode batch under the exploration policy.

        Returns (T, N, ...) trajectory arrays, on-device: policy states,
        desired/achieved goals, actions, next states/achieved goals."""
        venv = self.venv
        T = self.cfg.max_episode_steps
        N = venv.num_envs
        k_reset, k_scan = jax.random.split(key)
        state, obs = venv._reset(k_reset)

        def body(carry, _):
            state, obs, key = carry
            key, ka, ke, ku = jax.random.split(key, 4)
            a = self.policy(ts.params, obs, ka, noise)
            a_rand = jax.random.uniform(ku, a.shape, F32, -1.0, 1.0)
            a = jnp.where(jax.random.uniform(ke, (N, 1)) < random_eps,
                          a_rand, a)
            state2, obs2, reward, done, info = venv._step(state, a)
            out = dict(ps=obs['policy_state'], g=obs['desired_goal'],
                       ag=obs['achieved_goal'], act=a,
                       ps2=obs2['policy_state'], ag2=obs2['achieved_goal'],
                       achieved=info['goal_achieved'])
            return (state2, obs2, key), out

        (_, _, _), traj = jax.lax.scan(body, (state, obs, k_scan), None,
                                       length=T)
        return traj

    def her_minibatch(self, traj, key, batch_size: int):
        """Sample a minibatch with HER 'future' relabelling from the
        on-device episode buffer: with prob her_future_p the goal is replaced
        by the achieved goal of a future step of the same episode, and the
        reward recomputed with the env's kernel."""
        T = traj['act'].shape[0]
        N = traj['act'].shape[1]
        kt, kn, kf, kp = jax.random.split(key, 4)
        t = jax.random.randint(kt, (batch_size,), 0, T)
        n = jax.random.randint(kn, (batch_size,), 0, N)
        # future index in (t, T)
        u = jax.random.uniform(kf, (batch_size,))
        tf = (t + (u * (T - t)).astype(jnp.int32)).clip(0, T - 1)
        use_her = jax.random.uniform(kp, (batch_size,)) < self.her_future_p
        g = jnp.where(use_her[:, None], traj['ag2'][tf, n], traj['g'][t, n])
        ag2 = traj['ag2'][t, n]
        d = jnp.linalg.norm(ag2 - g, axis=-1)
        if self.cfg.binary_reward:
            reward = -(d > self.cfg.distance_threshold).astype(F32)
        else:
            reward = -d
        return dict(ps=traj['ps'][t, n], g=g, act=traj['act'][t, n],
                    ps2=traj['ps2'][t, n], reward=reward)

    def her_update(self, ts: TrainState, batch):
        def loss_fn(params):
            next_a = self._pi(ts.target, batch['ps2'], batch['g'])
            tq = self._q(ts.target, batch['ps2'], batch['g'], next_a)
            target = jax.lax.stop_gradient(
                self._clip_target(batch['reward'] + self.gamma * tq))
            q = self._q(params, batch['ps'], batch['g'], batch['act'])
            critic_loss = jnp.mean((q - target) ** 2)
            pi = self._pi(params, batch['ps'], batch['g'])
            actor_loss = -jnp.mean(self._q(
                jax.lax.stop_gradient(params), batch['ps'], batch['g'], pi)) \
                + self.action_l2 * jnp.mean(pi ** 2)
            return critic_loss + actor_loss, critic_loss

        grads, critic_loss = jax.grad(loss_fn, has_aux=True)(ts.params)
        updates, opt_state = self.tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return TrainState(params, self._polyak(ts.target, params),
                          opt_state), critic_loss

    def train_epoch(self, ts: TrainState, key, n_updates: int = 40,
                    batch_size: int = 4096, noise: float = 0.2,
                    random_eps: float = 0.3):
        """One DDPG-HER epoch: collect an episode batch, then n_updates
        HER minibatch steps from it. Fully jittable."""
        k_col, k_upd = jax.random.split(key)
        traj = self.collect_episode(ts, k_col, noise, random_eps)

        def upd(i, carry):
            ts, loss = carry
            batch = self.her_minibatch(traj, jax.random.fold_in(k_upd, i),
                                       batch_size)
            ts, critic_loss = self.her_update(ts, batch)
            return (ts, loss + critic_loss)

        ts, loss_sum = jax.lax.fori_loop(0, n_updates, upd, (ts, 0.0))
        metrics = {
            'critic_loss': loss_sum / n_updates,
            # exploration-policy success over the collected episodes
            'success': jnp.mean(traj['achieved'][-1].astype(F32)),
        }
        return ts, metrics

    def eval_success(self, ts: TrainState, key):
        """Deterministic-policy success rate over one episode batch."""
        venv = self.venv
        T = self.cfg.max_episode_steps
        state, obs = venv._reset(key)

        def body(carry, _):
            state, obs = carry
            a = self.policy(ts.params, obs)
            state, obs, reward, done, info = venv._step(state, a)
            return (state, obs), info['goal_achieved']

        (_, _), achieved = jax.lax.scan(body, (state, obs), None, length=T)
        return jnp.mean(achieved[-1].astype(F32))
