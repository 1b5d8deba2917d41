"""On-device goal-conditioned actor-critic (DDPG-style) learner.

The reference repo ships no learning code (its DDPG-HER agents live in a
separate repo, `/root/reference/README.md:18-21`); this module exists so the
framework's multi-chip story is end-to-end real: a full training step =
sharded env physics step + actor/critic forward/backward + grad reduction,
all one jitted program over the `('env',)` mesh. Data-parallel only — there
is no tensor/pipeline/sequence/expert parallelism analog for a robotics env
suite (SURVEY.md §2.4); the policy MLPs are tiny and replicated, the env
batch is the sharded axis, and XLA turns the batch-mean gradients below into
`psum` over ICI.
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
    opt_state: optax.OptState


class Learner:
    """Goal-conditioned DDPG-flavoured learner over a vectorised env.

    obs -> concat(policy_state, desired_goal) feeds the actor; the critic
    additionally takes the action. One `train_step` = env step under the
    current policy + one SGD step on the 1-step TD objective, computed from
    the transition batch that is still resident on-device.
    """

    def __init__(self, venv, hidden: int = 64, lr: float = 1e-3,
                 gamma: float = 0.98):
        self.venv = venv
        self.cfg = venv.cfg
        self.gamma = gamma
        self.hidden = hidden
        self.tx = optax.adam(lr)

        # policy input dim from an eval_shape probe (no device work)
        obs_struct = jax.eval_shape(lambda k: venv._reset(k)[1],
                                    jax.random.PRNGKey(0))
        self.obs_dim = (obs_struct['policy_state'].shape[-1]
                        + obs_struct['desired_goal'].shape[-1])
        self.act_dim = self.cfg.action_dim

    def init(self, key) -> TrainState:
        k1, k2 = jax.random.split(key)
        params = ACParams(
            actor=_mlp_init(k1, [self.obs_dim, self.hidden, self.hidden,
                                 self.act_dim]),
            critic=_mlp_init(k2, [self.obs_dim + self.act_dim, self.hidden,
                                  self.hidden, 1]))
        return TrainState(params=params, opt_state=self.tx.init(params))

    # ------------------------------------------------------------------ parts
    def policy(self, params: ACParams, obs, key=None, noise: float = 0.0):
        x = jnp.concatenate([obs['policy_state'], obs['desired_goal']], -1)
        a = jnp.tanh(_mlp_apply(params.actor, x))
        if key is not None and noise > 0:
            a = jnp.clip(a + noise * jax.random.normal(key, a.shape, F32),
                         -1.0, 1.0)
        return a

    def q_value(self, params: ACParams, obs, act):
        x = jnp.concatenate([obs['policy_state'], obs['desired_goal'], act], -1)
        return _mlp_apply(params.critic, x)[..., 0]

    # ------------------------------------------------------------- train step
    def train_step(self, ts: TrainState, env_state, key):
        """One fused env-interaction + TD-update step. Jit/shard this."""
        k_act, k_next = jax.random.split(key)
        obs = jax.vmap(self.venv.core._get_obs)(env_state)
        act = self.policy(ts.params, obs, k_act, noise=0.1)
        env_state, next_obs, reward, done, info = self.venv._step(env_state, act)

        def loss_fn(params):
            next_a = self.policy(params, next_obs)
            target = reward + self.gamma * jax.lax.stop_gradient(
                self.q_value(params, next_obs, next_a))
            q = self.q_value(params, obs, act)
            critic_loss = jnp.mean((q - jax.lax.stop_gradient(target)) ** 2)
            pi = self.policy(params, obs)
            actor_loss = -jnp.mean(self.q_value(
                jax.lax.stop_gradient(params), obs, pi))
            return critic_loss + actor_loss, (critic_loss, q)

        grads, (critic_loss, q) = jax.grad(loss_fn, has_aux=True)(ts.params)
        updates, opt_state = self.tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        metrics = {'critic_loss': critic_loss, 'mean_q': jnp.mean(q),
                   'mean_reward': jnp.mean(reward),
                   'success': jnp.mean(info['goal_achieved'].astype(F32))}
        return TrainState(params, opt_state), env_state, metrics
