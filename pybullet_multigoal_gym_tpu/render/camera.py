"""Camera matrix math: pure-JAX ports of PyBullet's ``computeViewMatrix`` /
``computeProjectionMatrixFOV`` and the default camera rigs of the reference
(`/root/reference/pybullet_multigoal_gym/envs/base_envs/base_env.py:47-76,
222-252`). FOV 60, near 0.1, far 100 throughout."""

import jax
import jax.numpy as jnp
import numpy as np

FOV = 60.0
NEAR = 0.1
FAR = 100.0


def view_matrix(eye, target, up):
    """Right-handed look-at matrix (column-major semantics like OpenGL;
    returned as a (4,4) row-major array V such that p_eye = V @ p_world)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = target - eye
    f = f / jnp.maximum(jnp.linalg.norm(f), 1e-9)
    s = jnp.cross(f, up)
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-9)
    u = jnp.cross(s, f)
    rot = jnp.stack([s, u, -f])                    # (3,3)
    trans = -rot @ eye
    V = jnp.concatenate([rot, trans[:, None]], axis=1)
    V = jnp.concatenate([V, jnp.array([[0.0, 0, 0, 1]], jnp.float32)], axis=0)
    return V


def projection_matrix_fov(fov=FOV, aspect=1.0, near=NEAR, far=FAR):
    f = 1.0 / np.tan(np.radians(fov) / 2.0)
    return jnp.array([
        [f / aspect, 0, 0, 0],
        [0, f, 0, 0],
        [0, 0, (far + near) / (near - far), 2 * far * near / (near - far)],
        [0, 0, -1, 0]], jnp.float32)


def default_camera_setup(render_width=128, render_height=128):
    """The reference's default observation camera (base_env.py:49-55)."""
    return [{
        'cameraEyePosition': [-1.0, 0.25, 0.6],
        'cameraTargetPosition': [-0.6, 0.05, 0.2],
        'cameraUpVector': [0, 0, 1],
        'render_width': render_width,
        'render_height': render_height,
    }]


def top_down_camera_setup():
    """Auto-appended top-down camera (base_env.py:60-68): 350x350,
    0.002 m/px over the 0.7x0.7 m workspace."""
    return {
        'cameraEyePosition': [-0.52, 0.0, 0.63],
        'cameraTargetPosition': [-0.52, 0.0, 0.02],
        'cameraUpVector': [1, 0, 0],
        'render_width': 350,
        'render_height': 350,
    }


def hand_camera_setup(hand_cam_pos, tip_pos, tracking=False):
    """On-hand camera (base_env.py:69-76, updated per render at :238-252:
    the tracked target is tip with z - 0.1)."""
    target = jnp.asarray(tip_pos, jnp.float32)
    if tracking:
        target = target.at[..., 2].add(-0.1)
    return {
        'cameraEyePosition': hand_cam_pos,
        'cameraTargetPosition': target,
        'cameraUpVector': [0, 0, 1],
        'render_width': 224,
        'render_height': 224,
    }


def view_inverse(V):
    """Closed-form inverse of a rigid look-at matrix: [R|t]^-1 = [R^T|-R^T t].

    `jnp.linalg.inv` is avoided throughout the renderer: a single 4x4 LU
    inverse compiles pathologically (minutes, NaN rays) on the TPU backend."""
    R = V[:3, :3]
    t = V[:3, 3]
    top = jnp.concatenate([R.T, (-R.T @ t)[:, None]], axis=1)
    return jnp.concatenate([top, jnp.array([[0.0, 0, 0, 1]], V.dtype)], axis=0)


def projection_inverse(P):
    """Closed-form inverse of the FOV projection matrix
    [[a,0,0,0],[0,b,0,0],[0,0,c,d],[0,0,-1,0]]."""
    a, b, c, d = P[0, 0], P[1, 1], P[2, 2], P[2, 3]
    z = jnp.zeros((), P.dtype)
    o = jnp.ones((), P.dtype)
    return jnp.stack([
        jnp.stack([1.0 / a, z, z, z]),
        jnp.stack([z, 1.0 / b, z, z]),
        jnp.stack([z, z, z, -o]),
        jnp.stack([z, z, 1.0 / d, c / d]),
    ])


def pv_inverse(V, P):
    """(P @ V)^-1 = V^-1 @ P^-1, both closed-form. HIGHEST precision: in
    bf16 the w-row entries (~+-5) round such that the far-plane homogeneous
    w is exactly 0 and all rays go NaN."""
    return jnp.matmul(view_inverse(V), projection_inverse(P),
                      precision=jax.lax.Precision.HIGHEST)


def pixel_rays(width, height, V, P):
    """Camera-through-pixel rays in world space.

    Returns (origins (H,W,3), directions (H,W,3)). Pixel (0,0) is the top-left
    like PyBullet's image layout."""
    inv = pv_inverse(V, P)
    xs = (2.0 * (jnp.arange(width, dtype=jnp.float32) + 0.5) - width) / width
    ys = -(2.0 * (jnp.arange(height, dtype=jnp.float32) + 0.5) - height) / height
    gx, gy = jnp.meshgrid(xs, ys)                  # (H,W)
    near_ndc = jnp.stack([gx, gy, -jnp.ones_like(gx), jnp.ones_like(gx)], -1)
    far_ndc = jnp.stack([gx, gy, jnp.ones_like(gx), jnp.ones_like(gx)], -1)
    pn = near_ndc @ inv.T
    pf = far_ndc @ inv.T
    pn = pn[..., :3] / pn[..., 3:4]
    pf = pf[..., :3] / pf[..., 3:4]
    d = pf - pn
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    return pn, d


def depth_buffer_from_world(points, V, P):
    """OpenGL depth-buffer value in [0,1] of world points — the quantity
    PyBullet's getCameraImage returns and `_render_pcd` unprojects
    (base_env.py:185-195)."""
    ph = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    clip = ph @ (P @ V).T
    return (clip[..., 2] / clip[..., 3]) * 0.5 + 0.5
