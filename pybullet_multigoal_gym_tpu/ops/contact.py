"""Analytic collision detection with fixed-size contact buffers.

TPU-native replacement for Bullet's broadphase/narrowphase (invoked implicitly
by ``stepSimulation`` in the reference, `robots/kuka.py:223-225`). Every
collider returns a *fixed* number of candidate contacts with an ``active``
mask, so shapes are static under jit/vmap.

Box-box contacts use the corner-in-box SDF scheme (8 corners of A tested
against B's signed distance field, and vice versa) plus one cross-piercing
fallback candidate for overlaps where no corner of either box lies inside the
other (thin boxes crossing, e.g. a finger pad vs the chest door handle).
"""

import jax
import jax.numpy as jnp

from pybullet_multigoal_gym_tpu.maths import quat as quatm

# Contact margin: candidates within this distance are kept active so the
# solver sees them one substep early (speculative contacts).
MARGIN = 1e-4

_CORNER_SIGNS = jnp.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)],
    dtype=jnp.float32)                     # (8,3)


def box_corners(center, rot, half):
    """World positions of a box's 8 corners. center (...,3), rot (...,4) wxyz,
    half (...,3) -> (...,8,3)."""
    local = _CORNER_SIGNS * half[..., None, :]
    return center[..., None, :] + quatm.rotate(rot[..., None, :], local)


def incident_face_corners(c, q, h, d):
    """The 4 corners of the box face most facing direction ``d``.

    The face whose outward normal maximises |dot| with d (sign-matched), i.e.
    the only face whose corners can shallowly contact an opponent lying along
    d. Used to build 4-candidate manifolds instead of all-8-corner ones —
    halves the contact-lane count (the VMEM currency of the Pallas kernels)
    with identical active sets at solver-scale penetrations.

    Returns (...,4,3) world corners."""
    R = quatm.to_matrix(q)                       # (...,3,3) cols = box axes
    dots = jnp.einsum('...i,...ik->...k', d, R)  # (...,3)
    onehot = jax.nn.one_hot(jnp.argmax(jnp.abs(dots), axis=-1), 3,
                            dtype=c.dtype)
    sgn = jnp.where(dots >= 0, 1.0, -1.0)
    f = jnp.einsum('...k,...ik->...i', onehot * sgn * h, R)
    oh_u = jnp.roll(onehot, 1, axis=-1)          # axis (k+1) % 3
    oh_v = jnp.roll(onehot, 2, axis=-1)          # axis (k+2) % 3
    u = jnp.einsum('...k,...ik->...i', oh_u * h, R)
    v = jnp.einsum('...k,...ik->...i', oh_v * h, R)
    base = c + f
    return jnp.stack([base - u - v, base - u + v,
                      base + u - v, base + u + v], axis=-2)


def box_plane(center, rot, half, plane_z):
    """Box vs the horizontal support plane z=plane_z. Returns 4 candidates
    (the bottom-facing face's corners).

    normal is +z (pushes the box up)."""
    down = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0], center.dtype),
                            center.shape)
    corners = incident_face_corners(center, rot, half, down)   # (...,4,3)
    pen = plane_z - corners[..., 2]                    # (...,4)
    active = pen > -MARGIN
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], corners.dtype),
                              corners.shape)
    return corners, normal, pen, active


def cylinder_plane(center, rot, radius, half_len, plane_z, n_rim=4):
    """Upright-ish cylinder vs support plane: 4 rim points of the bottom cap."""
    dt = center.dtype
    angles = jnp.arange(n_rim, dtype=dt) * (2.0 * jnp.pi / n_rim)
    rim_local = jnp.stack([radius * jnp.cos(angles), radius * jnp.sin(angles),
                           -half_len * jnp.ones_like(angles)], axis=-1)  # (4,3)
    pts = center[..., None, :] + quatm.rotate(rot[..., None, :], rim_local)
    pen = plane_z - pts[..., 2]
    active = pen > -MARGIN
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dt), pts.shape)
    return pts, normal, pen, active


def _point_in_box(p_local, half):
    """SDF-style test of points in a box's local frame.

    Returns (pen, normal_local, active): pen>0 means inside; normal is the
    face normal of the smallest exit distance (pointing out of the box)."""
    d = half - jnp.abs(p_local)                        # (...,3) distance to faces
    pen = jnp.min(d, axis=-1)
    axis = jnp.argmin(d, axis=-1)
    sign = jnp.sign(p_local + 0.0)
    sign = jnp.where(sign == 0, 1.0, sign)
    normal_local = jnp.take_along_axis(
        sign, axis[..., None], axis=-1) * jnp.eye(3, dtype=p_local.dtype)[axis]
    active = pen > -MARGIN
    return pen, normal_local, active


def corners_vs_box(ca, qa, ha, cb, qb, hb):
    """Corners of box A tested against box B. Returns 8 candidates.

    normal points from B toward A (i.e. pushes A out of B)."""
    corners = box_corners(ca, qa, ha)                  # (...,8,3)
    pl = quatm.rotate_inv(qb[..., None, :], corners - cb[..., None, :])
    pen, n_local, active = _point_in_box(pl, hb[..., None, :])
    n_world = quatm.rotate(qb[..., None, :], n_local)
    return corners, n_world, pen, active


def box_box_edge(ca, qa, ha, cb, qb, hb):
    """Edge-edge box-box candidate: 1 contact on the closest-point pair of
    the supporting edges, active when an edge-cross axis is the minimum
    separating axis of the full 15-axis SAT.

    Face manifolds (box_box) mis-handle the corner-on-edge regime — e.g.
    the insertion rectangle descending yawed into the slot pocket
    (assets/objects/insertion/slot.urdf): its bottom edges ride the bars'
    inner edges, and a face normal (vertical) only supports, while the true
    edge-cross normal is tilted and centres the peg into the hole (the
    self-aligning funnel MuJoCo/Bullet produce; tests/test_slot_entry.py).
    Follows the usual face-bias convention (the edge axis must beat the
    best face axis by 20% + 1 mm) so face-dominated stacking keeps its
    warm face manifolds.

    Returns (pt (..,1,3), nrm, pen, active); normal points B toward A."""
    dt = ca.dtype
    Ra = quatm.to_matrix(qa)
    Rb = quatm.to_matrix(qb)
    A = jnp.moveaxis(Ra, -1, -2)                 # (...,3,3) rows = axes of A
    Bx = jnp.moveaxis(Rb, -1, -2)
    t = ca - cb
    # face-axis SAT (for the bias comparison and the sat_ok gate)
    axes_f = jnp.concatenate([A, Bx], axis=-2)   # (...,6,3)
    ra_f = jnp.sum(jnp.abs(axes_f @ Ra) * ha[..., None, :], axis=-1)
    rb_f = jnp.sum(jnp.abs(axes_f @ Rb) * hb[..., None, :], axis=-1)
    ov_f = ra_f + rb_f - jnp.abs(
        jnp.einsum('...ki,...i->...k', axes_f, t))
    min_f = jnp.min(ov_f, axis=-1)
    # 9 edge-cross axes
    ax_a = A[..., :, None, :]                    # (...,3,1,3)
    ax_b = Bx[..., None, :, :]                   # (...,1,3,3)
    L = jnp.cross(jnp.broadcast_to(ax_a, ax_a.shape[:-3] + (3, 3, 3)),
                  jnp.broadcast_to(ax_b, ax_b.shape[:-3] + (3, 3, 3)))
    L = L.reshape(L.shape[:-3] + (9, 3))
    Ln = jnp.linalg.norm(L, axis=-1)
    ok_e = Ln > 1e-6                             # parallel pairs excluded
    Lu = L / jnp.maximum(Ln, 1e-6)[..., None]
    ra_e = jnp.sum(jnp.abs(jnp.einsum('...ki,...ij->...kj', Lu, Ra))
                   * ha[..., None, :], axis=-1)
    rb_e = jnp.sum(jnp.abs(jnp.einsum('...ki,...ij->...kj', Lu, Rb))
                   * hb[..., None, :], axis=-1)
    tl_e = jnp.einsum('...ki,...i->...k', Lu, t)
    ov_e = ra_e + rb_e - jnp.abs(tl_e)
    ov_e = jnp.where(ok_e, ov_e, jnp.inf)
    k = jnp.argmin(ov_e, axis=-1)
    min_e = jnp.take_along_axis(ov_e, k[..., None], axis=-1)[..., 0]
    n = jnp.take_along_axis(Lu, k[..., None, None], axis=-2)[..., 0, :]
    tk = jnp.take_along_axis(tl_e, k[..., None], axis=-1)[..., 0]
    n = n * jnp.where(tk >= 0, 1.0, -1.0)[..., None]    # B -> A
    sat_ok = (jnp.all(ov_f > -MARGIN, axis=-1)
              & jnp.all(ov_e > -MARGIN, axis=-1))
    # the edge candidate must beat the best face axis DECISIVELY (20% +
    # 1 mm): a borderline margin is a discrete switch that flips on float
    # noise, and the XLA engine and the Pallas kernels computing it with
    # different summation orders then diverge visibly on chaotic
    # multi-body scenes (engine-parity tests)
    edge_wins = min_e < jnp.minimum(min_f * 0.8, min_f) - 1e-3
    # supporting edges: corner of A extreme along -n (excluding the edge
    # axis ia = k // 3), corner of B extreme along +n (excluding ib = k % 3)
    ia, ib = k // 3, k % 3
    da = jnp.einsum('...i,...ij->...j', -n, Ra)         # (...,3) -n in A
    db = jnp.einsum('...i,...ij->...j', n, Rb)
    sa_c = jnp.where(jnp.arange(3) == ia[..., None], 0.0,
                     jnp.where(da >= 0, 1.0, -1.0)) * ha
    sb_c = jnp.where(jnp.arange(3) == ib[..., None], 0.0,
                     jnp.where(db >= 0, 1.0, -1.0)) * hb
    pa = ca + jnp.einsum('...j,...ij->...i', sa_c, Ra)  # edge A midpoint
    pb = cb + jnp.einsum('...j,...ij->...i', sb_c, Rb)
    ea = jnp.take_along_axis(A, ia[..., None, None], axis=-2)[..., 0, :]
    eb = jnp.take_along_axis(Bx, ib[..., None, None], axis=-2)[..., 0, :]
    # closest points of the two edge lines: pa + s*ea, pb + u*eb
    r = pa - pb
    a_ee = 1.0
    b_ee = jnp.einsum('...i,...i->...', ea, eb)
    c_ee = jnp.einsum('...i,...i->...', ea, r)
    d_ee = jnp.einsum('...i,...i->...', eb, r)
    den = jnp.maximum(a_ee - b_ee * b_ee, 1e-9)
    s = (b_ee * d_ee - c_ee) / den
    u = d_ee + b_ee * s
    ha_i = jnp.take_along_axis(ha, ia[..., None], axis=-1)[..., 0]
    hb_i = jnp.take_along_axis(hb, ib[..., None], axis=-1)[..., 0]
    s = jnp.clip(s, -ha_i, ha_i)
    u = jnp.clip(u, -hb_i, hb_i)
    pt = 0.5 * (pa + s[..., None] * ea + pb + u[..., None] * eb)
    pen = min_e
    active = sat_ok & edge_wins & (pen > -MARGIN) & jnp.isfinite(pen)
    pen = jnp.where(jnp.isfinite(pen), pen, 0.0)
    return (pt[..., None, :], n[..., None, :], pen[..., None],
            active[..., None])


def box_box(ca, qa, ha, cb, qb, hb):
    """Two-sided box-box contact with a SAT face normal: 9 candidates
    (4 incident-face corners of A in B, 4 of B in A, 1 cross-piercing
    fallback). Pure corner-on-edge overlaps get an extra edge-cross
    candidate from ``box_box_edge`` where the caller requests it (the
    engines append it for geom-geom/static/door pairs).

    Corner-in-box tests (both directions) supply the contact *points* and the
    active mask, but the shared manifold *normal* is the global minimum-
    penetration separating axis over the 6 face axes, and each point's depth
    is measured along it. A per-corner nearest-exit-face normal (the naive
    SDF choice) mis-attributes face-face contacts whenever a corner lies
    near an adjacent face — e.g. a gripper pad squeezing a block whose bottom
    is coplanar with the pad's bottom reports +-z normals instead of the +-y
    pinch axis, and the grasp silently fails. Edge-edge axes are ignored
    (fixed-topology manifolds; adequate for this suite's face-dominated
    stacking/pushing/grasping interactions).

    All normals point from B toward A."""
    dt = ca.dtype
    Ra = quatm.to_matrix(qa)                     # (...,3,3) cols = box axes
    Rb = quatm.to_matrix(qb)
    axes = jnp.concatenate([jnp.moveaxis(Ra, -1, -2),
                            jnp.moveaxis(Rb, -1, -2)], axis=-2)  # (...,6,3)
    t = ca - cb
    # projected half-extents of each box onto each axis
    ra = jnp.sum(jnp.abs(axes @ Ra) * ha[..., None, :], axis=-1)
    rb = jnp.sum(jnp.abs(axes @ Rb) * hb[..., None, :], axis=-1)
    tl = jnp.einsum('...ki,...i->...k', axes, t)
    overlap = ra + rb - jnp.abs(tl)              # (...,6)
    sat_ok = jnp.all(overlap > -MARGIN, axis=-1)
    k = jnp.argmin(overlap, axis=-1)
    L = jnp.take_along_axis(axes, k[..., None, None], axis=-2)[..., 0, :]
    tk = jnp.take_along_axis(tl, k[..., None], axis=-1)[..., 0]
    # normal points from B toward A
    n = L * jnp.where(tk >= 0, 1.0, -1.0)[..., None]
    # depth of each candidate corner along the SAT axis
    ra_n = jnp.sum(jnp.abs(jnp.einsum('...i,...ij->...j', n, Ra)) * ha, axis=-1)
    rb_n = jnp.sum(jnp.abs(jnp.einsum('...i,...ij->...j', n, Rb)) * hb, axis=-1)

    # candidate corners: only each box's incident face (the face toward the
    # other box along the SAT normal) — 4 per box instead of all 8
    p1 = incident_face_corners(ca, qa, ha, -n)     # A corners toward B
    p2 = incident_face_corners(cb, qb, hb, n)      # B corners toward A
    pl1 = quatm.rotate_inv(qb[..., None, :], p1 - cb[..., None, :])
    _, _, a1 = _point_in_box(pl1, hb[..., None, :])
    pl2 = quatm.rotate_inv(qa[..., None, :], p2 - ca[..., None, :])
    _, _, a2 = _point_in_box(pl2, ha[..., None, :])
    # A's corner past B's +n face: pen = rb_n - n.(p - cb)
    pen1 = rb_n[..., None] - jnp.einsum('...i,...ci->...c', n, p1 - cb[..., None, :])
    # B's corner past A's -n face: pen = n.(p - ca) + ra_n
    pen2 = jnp.einsum('...i,...ci->...c', n, p2 - ca[..., None, :]) + ra_n[..., None]

    # cross-piercing candidate: two boxes can overlap with NO corner of either
    # inside the other (e.g. the thin finger pad sweeping through the chest
    # door handle: each box's extent contains the other along different axes).
    # When face-axis SAT reports overlap but every corner test is silent,
    # activate one contact at the midpoint of the boxes' mutual closest
    # features, with the SAT minimum-overlap depth.
    p_on_b = cb + quatm.rotate(qb, jnp.clip(
        quatm.rotate_inv(qb, ca - cb), -hb, hb))
    p_on_a = ca + quatm.rotate(qa, jnp.clip(
        quatm.rotate_inv(qa, cb - ca), -ha, ha))
    p_cross = 0.5 * (p_on_a + p_on_b)
    pen_cross = jnp.min(overlap, axis=-1)
    corners_silent = ~(jnp.any(a1, axis=-1) | jnp.any(a2, axis=-1))
    act_cross = sat_ok & corners_silent

    pts = jnp.concatenate([p1, p2, p_cross[..., None, :]], axis=-2)
    nrm = jnp.broadcast_to(n[..., None, :], pts.shape)
    pen = jnp.concatenate([pen1, pen2, pen_cross[..., None]], axis=-1)
    act = jnp.concatenate([a1, a2, act_cross[..., None]], axis=-1) \
        & sat_ok[..., None]
    return pts, nrm, pen, act


def box_box_one_sided(ca, qa, ha, cb, qb, hb):
    """A-side box-box manifold: 5 candidates (4 incident-face corners of A
    in B + 1 cross-piercing fallback), SAT face normal.

    For a small free geom against a big static wall / door panel / pinned
    body, B's corners inside A are geometrically marginal — and the Pallas
    multibody kernel already uses exactly this manifold for those pairs
    (pallas_multibody._one_sided). The XLA engine uses it for the same
    pairs so the two engines solve identical lane sets (engine parity:
    manifold asymmetry gave visibly different bounces off the chest door).

    All normals point from B toward A."""
    dt = ca.dtype
    Ra = quatm.to_matrix(qa)
    Rb = quatm.to_matrix(qb)
    axes = jnp.concatenate([jnp.moveaxis(Ra, -1, -2),
                            jnp.moveaxis(Rb, -1, -2)], axis=-2)  # (...,6,3)
    t = ca - cb
    ra = jnp.sum(jnp.abs(axes @ Ra) * ha[..., None, :], axis=-1)
    rb = jnp.sum(jnp.abs(axes @ Rb) * hb[..., None, :], axis=-1)
    tl = jnp.einsum('...ki,...i->...k', axes, t)
    overlap = ra + rb - jnp.abs(tl)              # (...,6)
    sat_ok = jnp.all(overlap > -MARGIN, axis=-1)
    k = jnp.argmin(overlap, axis=-1)
    L = jnp.take_along_axis(axes, k[..., None, None], axis=-2)[..., 0, :]
    tk = jnp.take_along_axis(tl, k[..., None], axis=-1)[..., 0]
    n = L * jnp.where(tk >= 0, 1.0, -1.0)[..., None]
    rb_n = jnp.sum(jnp.abs(jnp.einsum('...i,...ij->...j', n, Rb)) * hb,
                   axis=-1)
    p1 = incident_face_corners(ca, qa, ha, -n)     # A corners toward B
    pl1 = quatm.rotate_inv(qb[..., None, :], p1 - cb[..., None, :])
    _, _, a1 = _point_in_box(pl1, hb[..., None, :])
    pen1 = rb_n[..., None] - jnp.einsum('...i,...ci->...c', n,
                                        p1 - cb[..., None, :])
    p_on_b = cb + quatm.rotate(qb, jnp.clip(
        quatm.rotate_inv(qb, ca - cb), -hb, hb))
    p_on_a = ca + quatm.rotate(qa, jnp.clip(
        quatm.rotate_inv(qa, cb - ca), -ha, ha))
    p_cross = 0.5 * (p_on_a + p_on_b)
    pen_cross = jnp.min(overlap, axis=-1)
    act_cross = sat_ok & ~jnp.any(a1, axis=-1)
    pts = jnp.concatenate([p1, p_cross[..., None, :]], axis=-2)
    nrm = jnp.broadcast_to(n[..., None, :], pts.shape)
    pen = jnp.concatenate([pen1, pen_cross[..., None]], axis=-1)
    act = jnp.concatenate([a1, act_cross[..., None]], axis=-1) \
        & sat_ok[..., None]
    return pts, nrm, pen, act


def sphere_plane(c, radius, plane_z):
    """Sphere vs the horizontal support plane: 1 candidate, normal +z."""
    pen = (plane_z + radius) - c[..., 2]
    active = pen > -MARGIN
    p = c - jnp.array([0.0, 0.0, 1.0], c.dtype) * radius
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], c.dtype), c.shape)
    return (p[..., None, :], n[..., None, :], pen[..., None],
            active[..., None])


def sphere_box(c, radius, cb, qb, hb):
    """Sphere (A side) vs box (B side): 1 candidate; normal pushes the sphere
    out of the box (B -> A). Handles the centre-inside-box case via the
    nearest-exit-face normal."""
    cl = quatm.rotate_inv(qb, c - cb)
    clamped = jnp.clip(cl, -hb, hb)
    delta = cl - clamped
    d = jnp.linalg.norm(delta, axis=-1)
    outside = d > 1e-9
    # outside: normal along delta; inside: nearest-exit-face normal
    n_out = delta / jnp.maximum(d, 1e-9)[..., None]
    exit_d = hb - jnp.abs(cl)
    axis = jnp.argmin(exit_d, axis=-1)
    sign = jnp.where(cl >= 0, 1.0, -1.0)
    n_in = jnp.take_along_axis(sign, axis[..., None], axis=-1) \
        * jnp.eye(3, dtype=c.dtype)[axis]
    n_local = jnp.where(outside[..., None], n_out, n_in)
    pen = jnp.where(outside, radius - d,
                    radius + jnp.min(exit_d, axis=-1))
    n = quatm.rotate(qb, n_local)
    p = c - n * radius
    active = pen > -MARGIN
    return (p[..., None, :], n[..., None, :], pen[..., None],
            active[..., None])


def box_cylinder_upright(cb, qb, hb, cc, radius, half_len):
    """Box (B-side) vs an upright cylinder (A-side): 2 candidates.

    Used for finger/block vs the slide puck. Lateral: clamp the cylinder axis
    into the box in the XY plane; vertical: cylinder cap vs box top/bottom.
    normal points from the box toward the cylinder (pushes the cylinder away).
    """
    # work in box local frame
    c_local = quatm.rotate_inv(qb, cc - cb)
    # lateral contact: closest point of box to the axis (at cylinder height)
    clamped = jnp.clip(c_local, -hb, hb)
    delta = c_local - clamped
    # horizontal separation only (upright assumption)
    d_xy = jnp.linalg.norm(delta[..., :2], axis=-1)
    outside = d_xy > 1e-6
    # axis inside the box in XY (deep penetration): push out through the
    # nearest exit face instead of an arbitrary direction — a garbage
    # default normal here launches the puck sideways once a fast finger
    # overruns it (seen in the slide strike).
    exit_d = hb[..., :2] - jnp.abs(c_local[..., :2])       # (...,2) >= 0 inside
    ax_min = jnp.argmin(exit_d, axis=-1)
    sgn_xy = jnp.where(c_local[..., :2] >= 0, 1.0, -1.0)
    onehot = jax.nn.one_hot(ax_min, 2, dtype=cc.dtype)
    n_in_xy = sgn_xy * onehot
    lateral_pen = jnp.where(outside, radius - d_xy,
                            radius + jnp.min(exit_d, axis=-1))
    n_out_xy = delta[..., :2] / jnp.maximum(d_xy[..., None], 1e-6)
    n_lat_local = jnp.concatenate(
        [jnp.where(outside[..., None], n_out_xy, n_in_xy),
         jnp.zeros_like(delta[..., :1])], axis=-1)
    p_lat = cc - quatm.rotate(qb, n_lat_local) * radius
    # vertical contact: cylinder bottom cap vs box top face (or cap vs bottom)
    vert_pen = (hb[..., 2] + half_len) - jnp.abs(c_local[..., 2])
    inside_xy = (jnp.abs(c_local[..., 0]) < hb[..., 0] + radius) & \
                (jnp.abs(c_local[..., 1]) < hb[..., 1] + radius)
    # the two candidates are EXCLUSIVE, keyed on the minimum-penetration
    # (SAT) direction: a side contact z-overlaps the box by centimetres, and
    # letting the vertical lane fire on that fake depth squeezes the puck
    # into the table until it squirts out watermelon-seed style (seen as the
    # slide puck launching at metres per second under a pushing finger).
    side_is_min = lateral_pen <= vert_pen
    lat_active = ((lateral_pen > -MARGIN) & side_is_min
                  & (jnp.abs(c_local[..., 2]) < hb[..., 2] + half_len))
    vert_active = (vert_pen > -MARGIN) & inside_xy & ~side_is_min
    sign_z = jnp.where(c_local[..., 2] >= 0, 1.0, -1.0)
    n_vert_local = jnp.stack([jnp.zeros_like(sign_z), jnp.zeros_like(sign_z),
                              sign_z], axis=-1)
    p_vert = cc - n_vert_local * half_len  # cap centre (approx, local==world z)
    pts = jnp.stack([p_lat, p_vert], axis=-2)
    nrm = jnp.stack([quatm.rotate(qb, n_lat_local),
                     quatm.rotate(qb, n_vert_local)], axis=-2)
    pen = jnp.stack([lateral_pen, vert_pen], axis=-1)
    act = jnp.stack([lat_active, vert_active], axis=-1)
    return pts, nrm, pen, act
