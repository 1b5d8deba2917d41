"""Shared scripted-control primitives for the acceptance tests.

These encode simple geometric strategies (approach from behind + push;
pick-and-place) against the PUBLIC env API: they read observations and emit
actions, proving end-to-end solvability of each task family
(reference analogue: the eyeball demos in examples/*.py).
"""

import numpy as np

TRAVERSE_Z = 0.30       # safe altitude: finger bottoms clear a 0.19 block top
PUSH_Z = 0.177          # pushing height: finger faces cover the block side


def _path_blocked(p0, p1, obstacles, margin=0.055):
    """True if the xy segment p0->p1 passes within ``margin`` of any
    obstacle centre (other blocks the low gripper would plow through)."""
    if obstacles is None or len(obstacles) == 0:
        return False
    d = p1 - p0
    L = np.linalg.norm(d)
    u = d / max(L, 1e-6)
    for ob in obstacles:
        s = float(np.clip(np.dot(ob[:2] - p0, u), 0.0, L))
        if np.linalg.norm(ob[:2] - (p0 + u * s)) < margin:
            return True
    return False


def push_step(grip, block, tgt, z_push=PUSH_Z, obstacles=None):
    """One EE-space pushing action (3,) driving ``block`` toward ``tgt``.

    Strategy: stage the EE at a point 5 cm behind the block on the goal
    line (clear of the block), descend there, then drive through the block
    toward the goal. While in pushing contact the gripper rides 1-2 cm
    behind the block centre, so the PUSH branch keeps control until the
    gripper actually crosses the block. ``obstacles`` (other block centres)
    force a rise when the low traverse path would sweep through one."""
    to_goal = tgt[:2] - block[:2]
    dg = np.linalg.norm(to_goal)
    pd = to_goal / max(dg, 1e-6)
    stage = block[:2] - pd * 0.05
    # close-in reach boundary: with the flange-down EE at push height the
    # tip only reaches x <= ~-0.41 (IK joint-4 limit saturates the close-in
    # corner of the kuka.py:40-41 workspace box). An ideal stage point past
    # the boundary deadlocks the expert against its own kinematics; clamp
    # the stage onto the boundary and push along the feasible diagonal —
    # the re-staging each pass walks the block toward the goal line.
    REACH_X = -0.415
    if stage[0] > REACH_X:
        stage = np.array([REACH_X, stage[1]])
        v = block[:2] - stage
        n = float(np.linalg.norm(v))
        if n > 1e-6 and float(v[0]) < -0.002:
            pd = v / n
        else:
            # block at/over the boundary: only a y-side sweep can touch it
            side = 1.0 if block[1] >= tgt[1] else -1.0
            stage = np.array([min(float(block[0]), REACH_X),
                              float(block[1]) + 0.05 * side])
            pd = np.array([0.0, -side])
    rel = grip[:2] - block[:2]
    along = float(np.dot(rel, pd))
    lat = float(np.linalg.norm(rel - along * pd))
    low = grip[2] < z_push + 0.02
    if low and along < -0.004 and lat < 0.03:
        # behind on the push line: drive through toward the target
        t = np.concatenate([block[:2] + pd * min(dg, 0.03), [z_push]])
        return np.clip((t - grip) * 30, -1, 1)
    if (low and along < -0.025
            and not _path_blocked(grip[:2], stage, obstacles)):
        # low, clearly behind, off the line: steer to the staging point
        # WITHOUT rising (rise + re-descend costs ~20 steps per cycle)
        t = np.concatenate([stage, [z_push]])
        return np.clip((t - grip) * 30, -1, 1)
    if low:
        # low on the wrong side of the block (or the low path is blocked):
        # rise before traversing
        return np.array([0.0, 0.0, 1.0])
    d_stage = np.linalg.norm(grip[:2] - stage)
    if d_stage < 0.021 or (d_stage < 0.045 and along < -0.028 and lat < 0.03):
        # above (or near-above) the staging point: descend onto it. The
        # base capture radius is 2.1 cm; near the close-in x bound the tip
        # saturates up to ~2.4 cm short of the ideal stage (IK joint-4
        # limit) and a tight radius flip-flops with the traverse branch
        # forever — so also descend whenever the tip is already behind the
        # block on roughly the push line, where going low is always safe.
        t = np.concatenate([stage, [z_push]])
        return np.clip((t - grip) * 30, -1, 1)
    t = np.concatenate([stage, [TRAVERSE_Z]])
    return np.clip((t - grip) * 30, -1, 1)


def pick_place_step(grip, closeness, block, tgt):
    """One grasping pick-and-place action: returns (xyz_action, grip_action).

    grip_action -1 opens the fingers, +1 closes them (kuka.py:169-172)."""
    d_xy = np.linalg.norm(grip[:2] - block[:2])
    d3 = np.linalg.norm(grip - block)
    holding = closeness < 0.038 and d3 < 0.02
    if holding:
        above = tgt + [0.0, 0.0, 0.06]
        if np.linalg.norm(grip[:2] - tgt[:2]) > 0.01:
            return np.clip((above - grip) * 25, -1, 1), 1.0
        return np.clip((tgt - grip) * 20, -1, 1), 1.0
    if d_xy > 0.01 or grip[2] < block[2] - 0.01:
        above = block + [0.0, 0.0, 0.06]
        return np.clip((above - grip) * 30, -1, 1), -1.0
    if closeness > 0.045 and d3 > 0.012:
        return np.clip((block - grip) * 30, -1, 1), -1.0
    return np.zeros(3), 1.0


def release_step(grip, block):
    """Open and retreat after a placement."""
    if grip[2] < block[2] + 0.05:
        return np.array([0.0, 0.0, 1.0]), -1.0
    return np.zeros(3), -1.0


def _goto(tgt, grip, gain=25):
    return np.clip((np.asarray(tgt) - grip) * gain, -1, 1)


class EEController:
    """Anti-windup wrapper for EE-space experts.

    The env integrates ``ee_target += a*0.01`` clipped only to the workspace
    box (kuka.py:208-220) — when the commanded point is kinematically
    saturated (IK residual near the close-in x bound) the target winds up
    against the box while the tip stalls, and the expert deadlocks. The
    mirror tracks the env's accumulator and freezes any axis whose
    integrated target already leads the measured tip by >2.5 cm."""

    WS_LOW = np.array([-0.67, -0.20, 0.175])
    WS_HIGH = np.array([-0.37, 0.20, 0.55])

    def _ee_reset(self):
        self._ee = None

    def _wrap(self, a, grip):
        a = np.clip(np.asarray(a, np.float64), -1.0, 1.0)
        if self._ee is None:
            self._ee = np.asarray(grip, np.float64).copy()
        lead = self._ee - grip
        a = np.where((lead > 0.025) & (a > 0), 0.0, a)
        a = np.where((lead < -0.025) & (a < 0), 0.0, a)
        self._ee = np.clip(self._ee + a * 0.01, self.WS_LOW, self.WS_HIGH)
        return a.astype(np.float32)


class RearrangeExpert(EEController):
    """Pushes each mismatched block to its flat target, worst-error first
    (block_rearrange: all targets on the table, no grasping needed).

    Block selection avoids staging points occupied by OTHER blocks (the
    descend-onto-stage branch of push_step would otherwise park on top of
    the obstructing block forever), and a stall detector re-selects when
    the gripper stops making progress."""

    def __init__(self, nb):
        self.nb = nb
        self.reset()

    def reset(self):
        self.cur = -1
        self.best_err = np.inf
        self.noprog = 0
        self.steps_on_cur = 0
        self.recover = 0
        self._ee_reset()

    def _stage_clear(self, i, ag, dg):
        pd = dg[i, :2] - ag[i, :2]
        pd = pd / max(np.linalg.norm(pd), 1e-6)
        stage = ag[i, :2] - pd * 0.05
        for j in range(self.nb):
            if j != i and np.linalg.norm(ag[j, :2] - stage) < 0.055:
                return False
        return True

    def _select(self, ag, dg, errs, exclude=-1):
        order = np.argsort(-errs)
        for i in order:
            if i != exclude and errs[i] >= 0.018 and self._stage_clear(
                    i, ag, dg):
                return int(i)
        for i in order:
            if errs[i] >= 0.018 and i != exclude:
                return int(i)
        return int(order[0])

    def __call__(self, obs):
        grip = obs['policy_state'][:3]
        ag = obs['achieved_goal'].reshape(self.nb, 3)
        dg = obs['desired_goal'].reshape(self.nb, 3)
        errs = np.linalg.norm(ag[:, :2] - dg[:, :2], axis=-1)
        if self.recover > 0:
            # unwind ee-target windup against the workspace floor: a long
            # streak of +z actions raises the clipped ee_target back above
            # the tip before any new approach is attempted
            self.recover -= 1
            if self.recover == 0:
                self.cur = self._select(ag, dg, errs, exclude=self.cur)
                self.best_err = errs[self.cur] if self.cur >= 0 else np.inf
                self.noprog = 0
                self.steps_on_cur = 0
            return self._wrap([0.0, 0.0, 1.0], grip)
        if self.cur >= 0:
            # error-progress watchdog: mm-scale gripper oscillation defeats
            # a positional stall check, so track the BLOCK error instead.
            # Only count steps spent IN pushing range (low + near) so the
            # approach/descend phases don't burn the budget; the hard cap
            # bounds total time on one block regardless.
            self.steps_on_cur += 1
            in_range = (grip[2] < 0.21 and np.linalg.norm(
                grip[:2] - ag[self.cur, :2]) < 0.10)
            if errs[self.cur] < self.best_err - 0.003:
                self.best_err = errs[self.cur]
                self.noprog = 0
            elif in_range:
                self.noprog += 1
        if self.cur < 0 or errs[self.cur] < 0.018:
            self.cur = self._select(ag, dg, errs)
            self.best_err = errs[self.cur]
            self.noprog = 0
            self.steps_on_cur = 0
        elif self.noprog >= 30 or self.steps_on_cur >= 80:
            # no block progress for 30 steps (saturated stage point or
            # obstructed approach): rise, then switch blocks
            self.recover = 14
            return self._wrap([0.0, 0.0, 1.0], grip)
        if errs[self.cur] < 0.018:
            return np.zeros(3, np.float32)
        obstacles = [ag[j] for j in range(self.nb) if j != self.cur]
        return self._wrap(push_step(grip, ag[self.cur], dg[self.cur],
                                    obstacles=obstacles), grip)


class StackExpert(EEController):
    """Builds the tower bottom-up with grasped pick-and-place
    (block_stack: per-level targets z = 0.175 + 0.03 k)."""

    def __init__(self, nb):
        self.nb = nb

    def reset(self):
        pass

    def _pick_place(self, grip, closeness, block, tgt):
        d_xy = np.linalg.norm(grip[:2] - block[:2])
        d3 = np.linalg.norm(grip - block)
        # success is || concat(ag) - concat(dg) || < 0.05 over ALL blocks
        # (multi_step.py reward kernel): ~2 cm per block suffices, and
        # re-picking an already-close block risks knocking it off the tower
        at_tgt = np.linalg.norm(block - tgt) < 0.02
        # a held 3 cm block reads closeness ~ 0.029-0.037 (jaws on its faces)
        # and can ride up to ~3 cm off the gripper frame; closeness ~ 0 means
        # the jaws closed on air. Mis-classifying a held block as "approach"
        # would command an open gripper and drop it (CPU-vs-TPU numerics put
        # borderline grasps at d3 ~ 0.021)
        holding = 0.015 < closeness < 0.038 and d3 < 0.032
        if at_tgt:
            if grip[2] < block[2] + 0.08:
                return np.array([0.0, 0.0, 1.0]), -1.0
            return np.zeros(3), -1.0
        if holding:
            # aim the HELD BLOCK at the target: offset the gripper goal by
            # the in-jaw block offset, else the block lands > at_tgt away
            aim = tgt + (grip - block)
            if np.linalg.norm(block[:2] - tgt[:2]) > 0.01:
                return _goto(aim + [0.0, 0.0, 0.06], grip), 1.0
            return _goto(aim, grip, 20), 1.0
        if closeness < 0.012 and d3 < 0.06:
            # closed on air next to the block: lift open and re-approach
            return np.array([0.0, 0.0, 0.6]), -1.0
        if d_xy > 0.01 or grip[2] < block[2] - 0.01:
            return _goto(block + [0.0, 0.0, 0.06], grip, 30), -1.0
        if closeness > 0.045 and d3 > 0.012:
            return _goto(block, grip, 30), -1.0
        return np.zeros(3), 1.0

    def __call__(self, obs):
        grip = obs['policy_state'][:3]
        closeness = obs['policy_state'][3]
        ag = obs['achieved_goal'].reshape(self.nb, 3)
        dg = obs['desired_goal'].reshape(self.nb, 3)
        a, g = np.zeros(3), -1.0
        for i in np.argsort(dg[:, 2]):          # bottom level first
            if np.linalg.norm(ag[i] - dg[i]) > 0.02:    # match at_tgt bar
                a, g = self._pick_place(grip, closeness, ag[i], dg[i])
                break
        return np.concatenate([a, [g]]).astype(np.float32)


class ChestPushExpert(EEController):
    """chest_push (front_sliding door): pinch the handle, sweep +y to slide
    the door open to 0.12, then push each block through the opening to its
    in-chest target (chest at (-0.70, 0, 0.17), door on the +x face)."""

    def __init__(self, nb):
        self.nb = nb
        self.reset()

    def reset(self):
        self.phase = 0

    def __call__(self, obs):
        nb = self.nb
        grip = obs['policy_state'][:3]
        door_q = obs['achieved_goal'][0]
        ag = obs['achieved_goal'][1:1 + 3 * nb].reshape(nb, 3)
        dg = obs['desired_goal'][1:1 + 3 * nb].reshape(nb, 3)
        if self.phase == 0:                     # rise clear of everything
            a = np.array([0.0, 0.0, 1.0])
            if grip[2] > 0.32:
                self.phase = 1
        elif self.phase == 1:                   # above the handle's -y side
            tgt = np.array([-0.567, -0.06, 0.33])
            a = _goto(tgt, grip)
            if np.linalg.norm(grip[:2] - tgt[:2]) < 0.008:
                self.phase = 2
        elif self.phase == 2:                   # descend to handle height
            tgt = np.array([-0.567, -0.06, 0.215])
            a = _goto(tgt, grip)
            if abs(grip[2] - 0.215) < 0.005:
                self.phase = 3
        elif self.phase == 3:                   # sweep +y: door slides open
            a = np.array([0.0, 1.0, 0.0])
            if door_q >= 0.112:
                self.phase = 4
        elif self.phase == 4:                   # retreat before block work
            a = np.array([-0.3, -0.5, 1.0])
            if grip[2] > 0.3:
                self.phase = 5
        else:                                   # push blocks into the chest
            # doorway (front_sliding, door slid +y): free gap y in
            # [-0.07, 0.05] at the x=-0.597 wall plane — stage each block
            # onto the gap centreline FIRST, then push straight -x through
            # it (a diagonal push clips the open door's edge and jams)
            a = np.zeros(3)
            for i in range(nb):
                if np.linalg.norm(ag[i][:2] - dg[i][:2]) > 0.025:
                    blk = ag[i]
                    if blk[0] > -0.582 and abs(blk[1]) > 0.03:
                        a = push_step(grip, blk,
                                      np.array([-0.555, 0.0, 0.175]))
                    else:
                        a = push_step(grip, blk, dg[i])
                    break
        return a.astype(np.float32)


class ChestPickExpert(EEController):
    """chest_pick_and_place (up_sliding lid): pinch-push the lid handle -x
    to open, then grasp each block and drop it over the chest centre."""

    def __init__(self, nb):
        self.nb = nb
        self.reset()

    def reset(self):
        self.phase = 0

    def __call__(self, obs):
        nb = self.nb
        grip = obs['policy_state'][:3]
        closeness = obs['policy_state'][3]
        door_q = obs['achieved_goal'][0]
        ag = obs['achieved_goal'][1:1 + 3 * nb].reshape(nb, 3)
        drop = np.array([-0.648, 0.0, 0.33])
        a, g = np.zeros(3), -1.0
        if self.phase == 0:
            a, g = np.array([0.0, 0.0, 1.0]), 1.0
            if grip[2] > 0.32:
                self.phase = 1
        elif self.phase == 1:                   # above the lid handle
            tgt = np.array([-0.545, 0.065, 0.34])
            a, g = _goto(tgt, grip), 1.0
            if np.linalg.norm(grip[:2] - tgt[:2]) < 0.008:
                self.phase = 2
        elif self.phase == 2:                   # descend beside the handle
            tgt = np.array([-0.545, 0.065, 0.26])
            a, g = _goto(tgt, grip), 1.0
            if abs(grip[2] - 0.26) < 0.005:
                self.phase = 3
        elif self.phase == 3:                   # sweep -x: lid slides open
            a, g = np.array([-1.0, 0.0, 0.0]), 1.0
            if door_q >= 0.092:
                self.phase = 4
        elif self.phase == 4:
            a, g = np.array([1.0, 0.0, 1.0]), -1.0
            if grip[2] > 0.31:
                self.phase = 5
        elif self.phase == 5:                   # above the block
            block = ag[0]
            a, g = _goto(block + [0, 0, 0.06], grip, 30), -1.0
            if (np.linalg.norm(grip[:2] - block[:2]) < 0.01
                    and grip[2] < block[2] + 0.075):
                self.phase = 6
        elif self.phase == 6:                   # descend around the block
            block = ag[0]
            a, g = _goto(block, grip, 30), -1.0
            if np.linalg.norm(grip - ag[0]) < 0.012:
                self.phase = 7
        elif self.phase == 7:                   # close the grasp
            a, g = np.zeros(3), 1.0
            if closeness < 0.037:
                self.phase = 8
        elif self.phase == 8:                   # carry over the chest mouth
            a, g = _goto(drop, grip), 1.0
            if np.linalg.norm(grip - drop) < 0.012:
                self.phase = 9
        else:                                   # release: block falls in
            a, g = np.zeros(3), -1.0
        return np.concatenate([a, [g]]).astype(np.float32)


class SlideExpert:
    """Closed-loop strike expert for the Slide task (joint_control mode).

    Slide goals sit beyond the EE workspace (target range shifted -0.4 m in
    x, kuka_single_step_base_env.py:66-69), so the puck must be STRUCK and
    coast over the mu=0.05 long table. The engine's arm servo reproduces
    Bullet POSITION_CONTROL transients (v* = posGain/dt * err = 15/s * err,
    kuka.py:282-290): commanding a waypoint ``gap`` metres ahead of the tip
    sweeps the tip at ~15*gap m/s. Open-loop waypoint schedules therefore
    whip the tip at several m/s once the arm lags (and launch the puck off
    the table); this expert paces the strike waypoint against the MEASURED
    tip position so contact happens at the computed strike speed, then holds
    at the release point and lets the puck coast.
    """

    MU_G = 0.05 * 9.81          # long-table friction * g (long_table.urdf)
    Z_STRIKE = 0.180            # finger pads cover the puck side (r=0.03)
    X_MIN, X_MAX = -0.665, -0.375
    Y_MAX = 0.195               # EE workspace (kuka.py:40-41) minus margin

    def __init__(self, ik_solve, rest_pose):
        self._ik = ik_solve     # (target_xyz, q_init) -> q (7,)
        self._rest = np.asarray(rest_pose, np.float64)
        self.reset()

    def reset(self):
        self.jt = self._rest.copy()      # mirror of the env's joint target
        self.phase = 0
        self.plan = None
        self.prev_puck = None
        self.still = 0
        self.strikes = 0

    # ------------------------------------------------------------------ plan
    def _inside(self, p):
        return (self.X_MIN <= p[0] <= self.X_MAX
                and -self.Y_MAX <= p[1] <= self.Y_MAX)

    # ------------------------------------------------------------------ step
    def __call__(self, obs):
        """Phases: 0 rise, 1 traverse above the start, 2 descend behind the
        puck, 3 paced strike along the goal line, 4 hold while the puck
        coasts (+ re-plan from the new position when it stalls short but is
        still inside the strikeable box). Diagonal strikes drift laterally
        off the narrow fixed-yaw paddle face (the reference's paddle is no
        different), so far goals resolve to near-misses on some seeds — the
        acceptance test asserts aggregate progress + wins, not perfection."""
        tip = obs['observation'][7:10]
        puck = obs['achieved_goal']
        goal = obs['desired_goal']
        q = obs['observation'][:7]

        if self.plan is None:
            axis = goal[:2] - puck[:2]
            dist = float(np.linalg.norm(axis))
            axis = axis / max(dist, 1e-6)
            s_room = 0.0                         # stroke room inside the box
            while (self._inside(puck[:2] + axis * (s_room + 0.01))
                   and s_room < 0.6):
                s_room += 0.01
            ft = 0.06                            # full-speed follow-through
            d_coast = max(dist - s_room - ft - 0.05, 0.0)
            # 0.92: bias slightly under — the release impulse tends to run
            # a little hot, and an undershoot lands nearer the line
            v = min(np.sqrt(2.0 * self.MU_G * d_coast) * 0.92 + 0.02, 0.45)
            stop = min(s_room + ft, max(dist - 0.01, 0.01))
            start = np.array([*(puck[:2] - axis * 0.11), self.Z_STRIKE])
            self.plan = dict(p0=puck[:2].copy(), axis=axis, v=v, stop=stop,
                             start=start,
                             q_start=np.asarray(self._ik(start, self._rest)),
                             gap=float(np.clip(v / 15.0, 0.012, 0.03)))
            self.q_up = np.asarray(self._ik(
                np.array([tip[0], tip[1], 0.33]), self._rest))
            self.q_hi = np.asarray(self._ik(
                np.array([*start[:2], 0.33]), self.q_up))
        pl = self.plan

        # puck motion bookkeeping (for re-plan decisions; only meaningful
        # once the strike has begun — during the approach the puck is still)
        if self.prev_puck is not None and self.phase >= 3:
            self.still = (self.still + 1
                          if np.linalg.norm(puck[:2] - self.prev_puck[:2])
                          < 5e-4 else 0)
        self.prev_puck = puck.copy()

        if self.phase == 0:                      # rise
            des = self.q_up
            if np.max(np.abs(self.q_up - q)) < 0.05:
                self.phase = 1
        if self.phase == 1:                      # traverse above the start
            des = self.q_hi
            if np.max(np.abs(self.q_hi - q)) < 0.03:
                self.phase = 2
        if self.phase == 2:                      # descend behind the puck
            des = pl['q_start']
            if np.max(np.abs(pl['q_start'] - q)) < 0.015:
                self.phase = 3
        if self.phase == 3:                      # paced strike on the line
            s_tip = float(np.dot(tip[:2] - pl['p0'], pl['axis']))
            # project onto the strike line (the target carries NO lateral
            # component, re-centering the tip on the line every step) and
            # never command past the stroke end
            s_cmd = min(s_tip + pl['gap'], pl['stop'] + 0.005)
            tgt = pl['p0'] + pl['axis'] * s_cmd
            self.q_strike = np.asarray(self._ik(
                np.array([*tgt, self.Z_STRIKE]), q.astype(np.float64)))
            des = self.q_strike
            s_puck = float(np.dot(puck[:2] - pl['p0'], pl['axis']))
            # release: puck pushed far enough, or the tip has overrun the
            # planned stroke (it rides ~0.046 behind the puck centre)
            if s_puck >= pl['stop'] or s_tip >= pl['stop'] + 0.02:
                self.phase = 4
        if self.phase == 4:                      # hold; let the puck coast
            des = getattr(self, 'q_strike', pl['q_start'])
            # next stage / re-strike once the puck settles, if reachable
            if (self.still >= 3 and self.strikes < 4
                    and np.linalg.norm(puck[:2] - goal[:2]) > 0.045
                    and self._inside(puck[:2])):
                self.strikes += 1
                self.plan = None
                self.phase = 0
                self.prev_puck = None
                self.still = 0
                des = self.q_up
        a = np.clip((des - self.jt) / 0.05, -1.0, 1.0)
        self.jt = self.jt + a * 0.05
        return a.astype(np.float32)


class InsertionExpert:
    """Scripted insertion-family expert: stage behind the rectangle on the
    line to the slot pocket, squeeze the pads onto it, then SLIDE it toward
    the pocket mouth, exercising the 6-DoF rotation channel on approach.

    Physics bound (identical in the reference): the rectangle is mass 100
    (insertion/rectangle.urdf:17) while the finger drive saturates at 50 N
    (kuka.py:299), so a friction grasp can hold at most ~100 N — far short
    of the 981 N needed to lift. The 'pick_up' subtask (object at z=0.15)
    is therefore unachievable by construction; the achievable surface this
    expert demonstrates: grasp closure onto the object, EE force-sensor
    response, and pushing/dragging the rectangle to the slot."""

    Z_PUSH = 0.075        # 1.5 cm above the upright rectangle's COM

    def __init__(self):
        self.reset()

    def reset(self):
        self.phase = 0
        self.squeeze_t = 0

    @staticmethod
    def _yaw(euler):
        # upright objects have ZYZ euler (yaw/2, ~0, yaw/2): alpha+gamma=yaw
        return float(euler[0] + euler[2])

    def pocket_xy(self, obs):
        aux = obs['auxiliary_task_state']
        syaw = self._yaw(aux[3:6])
        return np.asarray(aux[0:2]) + 0.03 * np.array(
            [-np.cos(syaw), -np.sin(syaw)])   # slot_target frame (link 3)

    def __call__(self, obs):
        grip = obs['policy_state'][:3]
        aux = obs['auxiliary_task_state']
        rect = np.asarray(aux[6:9])
        pocket = self.pocket_xy(obs)
        to_goal = pocket - rect[:2]
        d = float(np.linalg.norm(to_goal))
        u = to_goal / max(d, 1e-6)
        a, rot, g = np.zeros(3), np.zeros(3), -1.0
        stage = rect[:2] - u * 0.055
        if self.phase == 0:                    # high traverse to the stage
            tgt = np.array([stage[0], stage[1], 0.20])
            a = _goto(tgt, grip)
            rot[0] = 0.5                       # exercise the rotation channel
            if np.linalg.norm(grip[:2] - stage) < 0.012:
                self.phase = 1
        elif self.phase == 1:                  # descend behind the rectangle
            tgt = np.array([stage[0], stage[1], self.Z_PUSH])
            a = _goto(tgt, grip)
            rot[0] = -0.5                      # and rotate back
            if abs(grip[2] - self.Z_PUSH) < 0.006:
                self.phase = 2
        elif self.phase == 2:                  # slide to straddle it
            tgt = np.array([rect[0], rect[1], self.Z_PUSH])
            a = _goto(tgt, grip, 20)
            if np.linalg.norm(grip[:2] - rect[:2]) < 0.012:
                self.phase = 3
        elif self.phase == 3:                  # squeeze the grasp closed
            g = 1.0
            self.squeeze_t += 1
            if self.squeeze_t > 12:
                self.phase = 4
        else:                                  # drag/push toward the pocket
            g = 1.0
            tgt = np.array([rect[0] + u[0] * min(d, 0.02),
                            rect[1] + u[1] * min(d, 0.02), self.Z_PUSH])
            a = _goto(tgt, grip, 20)
        return np.concatenate([a, rot, [g]]).astype(np.float32)


class PrimitivePushExpert:
    """Scripted discrete_push expert: each action places a 0.1 m push stroke
    behind the goal object aimed along the goal line.

    Uses the discrete decode (kuka.py:174-177: start = pixel * resolution +
    workspace lower, angle = 2pi/20 * idx) because the continuous decode's
    angle span is only +-pi/2 — the discrete primitive covers the full
    circle at 18-degree resolution."""

    LOWER = np.array([-0.755, -0.175])
    RESOLUTION = 0.0015625

    def reset(self):
        pass

    def __call__(self, obs):
        obj = obs['achieved_goal'][:3]
        goal = obs['desired_goal'][:3]
        to_goal = goal[:2] - obj[:2]
        d = float(np.linalg.norm(to_goal))
        # a pushed box slides along ITS OWN face normal (the objects spawn
        # yaw-randomised, kuka_shape_assemble_base_env.py:106-129): pushing
        # along an arbitrary goal heading shoves a tilted face and the
        # wedge action squirts the box SIDEWAYS. So walk the box Manhattan
        # in its own frame: push the face whose outward normal best aligns
        # with the goal line, and size the engagement to the goal-line
        # projection of that normal.
        yaw = float(obs['achieved_goal'][3] + obs['achieved_goal'][5]) \
            if obs['achieved_goal'].shape[0] >= 6 else 0.0
        # stroke placement: the interpolated executor sweeps at ~0.125 m/s,
        # so the push is quasi-static — object movement ~ pad engagement
        # = 0.1 - (back - 0.0275). Start the fixed 0.1 m stroke far enough
        # behind that the engagement equals the remaining distance (the
        # object lands ON the goal); never closer than 5.5 cm (the
        # descending pads must clear the object). Candidate strokes whose
        # start lies in the IK-saturated close-in corner (x > ~-0.425, see
        # push_step REACH_X) are rejected — a saturated descent flails the
        # wrist through the object; the best REACHABLE face normal wins,
        # even with a small negative goal-line dot (repositioning stroke:
        # the off-centre contact also yaws the box, opening better faces).
        best = None
        near_edge = obj[0] > -0.48
        for k in range(4):
            c = yaw + k * np.pi / 2
            u_f = np.array([np.cos(c), np.sin(c)])   # exact face normal
            dot = float(np.dot(to_goal, u_f))
            idx = int(round(c / (2 * np.pi / 20))) % 20
            ang_q = 2 * np.pi / 20 * idx
            u = np.array([np.cos(ang_q), np.sin(ang_q)])
            back = max(0.1275 - max(dot, 0.02), 0.055)
            start = obj[:2] - u * back
            if start[0] > -0.425:
                continue
            if near_edge and u_f[0] > 0.2 and dot < 0.03:
                # never nudge a near-edge object further toward the
                # unreachable +x corner unless it is real goal progress
                continue
            if best is None or dot > best[0]:
                best = (dot, idx, start)
        if best is None:                        # fully cornered: sweep -x
            idx, start = 10, obj[:2] - np.array([-1.0, 0.0]) * 0.055
        else:
            _, idx, start = best
        px = int(round((start[0] - self.LOWER[0]) / self.RESOLUTION))
        py = int(round((start[1] - self.LOWER[1]) / self.RESOLUTION))
        return np.array([idx, np.clip(px, 0, 223), np.clip(py, 0, 223)],
                        np.float32)


def run_episodes(env, policy, n_episodes=3, max_steps=100):
    """Roll scripted episodes; returns the number of wins."""
    wins = 0
    for _ in range(n_episodes):
        obs = env.reset()
        if hasattr(policy, 'reset'):
            policy.reset()
        for _ in range(max_steps):
            obs, reward, done, info = env.step(policy(obs))
            if info['goal_achieved']:
                wins += 1
                break
    return wins
