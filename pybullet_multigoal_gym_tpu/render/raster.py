"""Analytic ray-cast renderer: the TPU-native replacement for PyBullet's
``getCameraImage`` (`/root/reference/pybullet_multigoal_gym/envs/base_envs/
base_env.py:140-168`).

The scene is a flat list of primitives (sphere / box / cylinder / capsule)
with per-primitive pose, size and color; for each pixel the nearest
intersection is shaded (Lambert + ambient). Depth is returned as the OpenGL
depth-buffer value so the reference's point-cloud back-projection
(`base_env.py:170-195`) works unchanged. Everything vectorises over pixels and
vmaps over envs.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.maths import quat as quatm
from pybullet_multigoal_gym_tpu.render import camera as cam

SPHERE, BOX, CYLINDER, CAPSULE = 0, 1, 2, 3

_BIG = 1e9


class Prims(NamedTuple):
    """Flat primitive soup. size semantics: sphere (r,-,-), box half-extents,
    cylinder (r, half_len, -), capsule (r, half_len, -) along local z."""
    kind: jnp.ndarray      # (P,) int32
    pos: jnp.ndarray       # (P,3)
    rot: jnp.ndarray       # (P,4) wxyz
    size: jnp.ndarray      # (P,3)
    color: jnp.ndarray     # (P,3)
    visible: jnp.ndarray   # (P,) bool


def _ray_sphere(o, d, r):
    b = jnp.sum(o * d, -1)
    c = jnp.sum(o * o, -1) - r * r
    disc = b * b - c
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    hit = (disc > 0) & (t > 0)
    n = o + t[..., None] * d
    return jnp.where(hit, t, _BIG), n


def _ray_box(o, d, half):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t0 = (-half - o) * inv
    t1 = (half - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= tmin) & (tmax > 0)
    t = jnp.where(tmin > 0, tmin, tmax)
    p = o + t[..., None] * d
    # face normal: axis with |p| closest to the half extent
    rel = jnp.abs(jnp.abs(p) - half)
    axis = jnp.argmin(rel, axis=-1)
    n = jnp.sign(p) * jax.nn.one_hot(axis, 3, dtype=p.dtype)
    return jnp.where(hit, t, _BIG), n


def _ray_cylinder(o, d, r, hl):
    # side surface
    a = d[..., 0] ** 2 + d[..., 1] ** 2
    b = o[..., 0] * d[..., 0] + o[..., 1] * d[..., 1]
    c = o[..., 0] ** 2 + o[..., 1] ** 2 - r * r
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_side = (-b - sq) / jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    z_side = o[..., 2] + t_side * d[..., 2]
    side_ok = (disc > 0) & (t_side > 0) & (jnp.abs(z_side) <= hl)
    p_side = o + t_side[..., None] * d
    n_side = jnp.concatenate([p_side[..., :2], jnp.zeros_like(p_side[..., :1])],
                             axis=-1)
    n_side = n_side / jnp.maximum(jnp.linalg.norm(n_side, axis=-1,
                                                  keepdims=True), 1e-9)
    # caps
    dz = jnp.where(jnp.abs(d[..., 2]) < 1e-9, 1e-9, d[..., 2])
    sign = jnp.where(d[..., 2] > 0, -1.0, 1.0)
    t_cap = (sign * hl - o[..., 2]) / dz
    p_cap = o + t_cap[..., None] * d
    cap_ok = (t_cap > 0) & (p_cap[..., 0] ** 2 + p_cap[..., 1] ** 2 <= r * r)
    n_cap = jnp.concatenate([jnp.zeros_like(p_cap[..., :2]),
                             sign[..., None] * jnp.ones_like(p_cap[..., :1])],
                            axis=-1)
    t_side = jnp.where(side_ok, t_side, _BIG)
    t_cap = jnp.where(cap_ok, t_cap, _BIG)
    use_side = t_side < t_cap
    t = jnp.minimum(t_side, t_cap)
    n = jnp.where(use_side[..., None], n_side, n_cap)
    return t, n


def _ray_capsule(o, d, r, hl):
    """Capsule along local z: cylinder side + two sphere caps."""
    t_cyl, n_cyl = _ray_cylinder(o, d, r, hl)
    hl = jnp.asarray(hl)[..., None]     # broadcast per-ray hl over xyz
    t1, n1 = _ray_sphere(o - jnp.array([0.0, 0, 1]) * hl, d, r)
    t2, n2 = _ray_sphere(o + jnp.array([0.0, 0, 1]) * hl, d, r)
    t = jnp.minimum(t_cyl, jnp.minimum(t1, t2))
    n = jnp.where((t == t_cyl)[..., None], n_cyl,
                  jnp.where((t == t1)[..., None], n1, n2))
    return t, n


_LIGHT_DIR = np.array([0.4, -0.35, 0.85])
_LIGHT_DIR = _LIGHT_DIR / np.linalg.norm(_LIGHT_DIR)
_BACKGROUND = np.array([0.8, 0.85, 0.95], np.float32)


def trace(prims: Prims, origins, dirs):
    """Nearest-hit trace. origins/dirs: (...,3). Returns color (...,3) float in
    [0,1], hit point (...,3), hit mask (...).

    Primitive KINDS are static per env config (visuals.build_prims assembles
    them from literals), so when `prims.kind` is a concrete array the trace
    groups primitives by kind and runs exactly ONE intersector per group —
    the dynamic jnp.select path (all four intersectors for every primitive,
    4x the ray math) is only the fallback for traced kinds.

    The static path computes per-prim DEPTHS only (ts: (P, ...)) and
    re-derives the surface normal for just the argmin-winning primitive of
    each pixel afterwards: materialising every prim's normal field
    ((P, ..., 3) — 3x the depth buffer, the largest live render buffer)
    loses to one extra 4-way intersector eval per pixel for any P > ~4."""
    kinds_np = None
    if not isinstance(prims.kind, jax.core.Tracer):
        kinds_np = np.asarray(prims.kind)

    def local_ray(pos, rot):
        o = quatm.rotate_inv(rot, origins - pos)
        d = quatm.rotate_inv(rot, dirs)
        return o, d

    def winner_normal(idx):
        # recompute the hit normal for each pixel's winning primitive via
        # the dynamic 4-way intersector on the gathered prim params
        wkind, wpos = prims.kind[idx], prims.pos[idx]
        wrot, wsize = prims.rot[idx], prims.size[idx]
        o = quatm.rotate_inv(wrot, origins - wpos)
        d = quatm.rotate_inv(wrot, dirs)
        _, n_s = _ray_sphere(o, d, wsize[..., 0])
        _, n_b = _ray_box(o, d, wsize)
        _, n_c = _ray_cylinder(o, d, wsize[..., 0], wsize[..., 1])
        _, n_p = _ray_capsule(o, d, wsize[..., 0], wsize[..., 1])
        n = jnp.select([(wkind == SPHERE)[..., None],
                        (wkind == BOX)[..., None],
                        (wkind == CYLINDER)[..., None]],
                       [n_s, n_b, n_c], n_p)
        return quatm.rotate(wrot, n)

    if kinds_np is not None:
        ts_parts, order = [], []
        intersect = {
            SPHERE: lambda o, d, s: _ray_sphere(o, d, s[0]),
            BOX: lambda o, d, s: _ray_box(o, d, s),
            CYLINDER: lambda o, d, s: _ray_cylinder(o, d, s[0], s[1]),
            CAPSULE: lambda o, d, s: _ray_capsule(o, d, s[0], s[1]),
        }
        for kind in (SPHERE, BOX, CYLINDER, CAPSULE):
            sel = np.nonzero(kinds_np == kind)[0]
            if len(sel) == 0:
                continue
            order += list(sel)

            def per_prim(pos, rot, size, visible, _k=kind):
                o, d = local_ray(pos, rot)
                t, _ = intersect[_k](o, d, size)
                return jnp.where(visible, t, _BIG)

            ts_parts.append(jax.vmap(per_prim, in_axes=(0, 0, 0, 0))(
                prims.pos[sel], prims.rot[sel], prims.size[sel],
                prims.visible[sel]))
        inv_order = np.argsort(np.asarray(order))
        ts = jnp.concatenate(ts_parts, axis=0)[inv_order]
        ns = None
    else:
        def per_prim(kind, pos, rot, size, visible):
            o, d = local_ray(pos, rot)
            ts, ns = _ray_sphere(o, d, size[0])
            tb, nb = _ray_box(o, d, size)
            tc, nc = _ray_cylinder(o, d, size[0], size[1])
            tp, npp = _ray_capsule(o, d, size[0], size[1])
            t = jnp.select([kind == SPHERE, kind == BOX, kind == CYLINDER],
                           [ts, tb, tc], tp)
            n = jnp.select([(kind == SPHERE)[..., None],
                            (kind == BOX)[..., None],
                            (kind == CYLINDER)[..., None]],
                           [ns, nb, nc], npp)
            t = jnp.where(visible, t, _BIG)
            return t, quatm.rotate(rot, n)

        ts, ns = jax.vmap(per_prim, in_axes=(0, 0, 0, 0, 0),
                          out_axes=(0, 0))(prims.kind, prims.pos, prims.rot,
                                           prims.size, prims.visible)
    # ts: (P, ...); ns: (P, ..., 3) on the dynamic path, None on the static
    # path (normals recomputed for the winner only)
    idx = jnp.argmin(ts, axis=0)
    tmin = jnp.min(ts, axis=0)
    hit = tmin < _BIG * 0.5
    if ns is None:
        n = winner_normal(idx)
    else:
        n = jnp.take_along_axis(ns, idx[None, ..., None], axis=0)[0]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    base = prims.color[idx]
    lambert = jnp.maximum(jnp.sum(n * jnp.asarray(_LIGHT_DIR, n.dtype), -1), 0.0)
    shade = 0.35 + 0.65 * lambert
    color = jnp.where(hit[..., None], base * shade[..., None],
                      jnp.asarray(_BACKGROUND))
    point = origins + jnp.where(hit, tmin, cam.FAR)[..., None] * dirs
    return color, point, hit


def render(prims: Prims, V, P, width, height, mode='rgb_array'):
    """Render one image. Returns uint8 arrays shaped like the reference:
    rgb (H,W,3), depth (H,W,1) uint8, rgbd (H,W,4); mode 'pcd' returns the
    float depth buffer for back-projection."""
    origins, dirs = cam.pixel_rays(width, height, V, P)
    color, point, hit = trace(prims, origins, dirs)
    depth = cam.depth_buffer_from_world(point, V, P)
    depth = jnp.where(hit, depth, 1.0)
    rgb = jnp.clip(color * 255.0, 0, 255).astype(jnp.uint8)
    if mode == 'rgb_array':
        return rgb
    if mode == 'depth_float':
        return depth
    depth_u8 = (depth * 255.0).astype(jnp.uint8)[..., None]
    if mode == 'depth':
        return depth_u8
    if mode == 'rgbd_array':
        return jnp.concatenate([rgb, depth_u8], axis=-1)
    raise ValueError(mode)


def render_pcd(depth_float, V, P, width, height, step=2):
    """Point-cloud back-projection, port of `_render_pcd`
    (base_env.py:170-195): stride-2 pixel unprojection through inv(P@V).
    Fully vectorised instead of the reference's Python double loop."""
    inv = cam.pv_inverse(V, P)
    ws = jnp.arange(0, width, step)
    hs = jnp.arange(0, height, step)
    gw, gh = jnp.meshgrid(ws, hs)
    x = (2.0 * gw - width) / width
    y = -(2.0 * gh - height) / height
    z = 2.0 * depth_float[gh, gw] - 1.0
    pix = jnp.stack([x, y, z, jnp.ones_like(x)], axis=-1)
    pos = pix @ inv.T
    pos = pos / pos[..., 3:4]
    return pos[..., :3].reshape(-1, 3)


def render_state(core_env, state, mode='rgb_array', camera_id=0):
    """Render a batched env state (adapter entry point). Lazily builds and
    caches a RenderPipeline on the core env."""
    from pybullet_multigoal_gym_tpu.render.pipeline import RenderPipeline
    pipe = getattr(core_env, '_render_pipeline', None)
    if pipe is None:
        pipe = RenderPipeline(core_env)
        core_env._render_pipeline = pipe
    return jax.vmap(lambda s: pipe.render(s, mode=mode, camera_id=camera_id))(state)
