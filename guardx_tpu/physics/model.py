"""Physics model: static description of an articulated rigid-body system.

The host-side ``mujoco`` package is used purely as an MJCF *compiler*: we load
the XML, let MuJoCo compute inertias / joint addressing / default resolution,
and then extract everything the device pipeline needs into plain arrays.
This mirrors what the reference does with ``mjx.put_model``
(reference: safe_rl_envs/safe_rl_envs/envs/engine.py:231), except the target
is our own JAX pipeline rather than MJX.

``Model`` is a frozen pytree whose array leaves live on device; structural
integers (sizes, addresses) are static so that every jitted program has fully
static shapes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

# Joint type codes (match mujoco.mjtJoint order)
FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3
# Per-joint qpos width, by type (reference engine.py:67 JOINT_SIZE = [7,4,1,1])
JOINT_QPOS_WIDTH = [7, 4, 1, 1]
JOINT_DOF_WIDTH = [6, 3, 1, 1]

# Dof kinds used by the device kernels
DOF_SLIDE, DOF_HINGE, DOF_FREE_T, DOF_FREE_R = 0, 1, 2, 3

# Geom type codes (match mujoco.mjtGeom)
GEOM_PLANE, GEOM_HFIELD, GEOM_SPHERE, GEOM_CAPSULE = 0, 1, 2, 3
GEOM_ELLIPSOID, GEOM_CYLINDER, GEOM_BOX = 4, 5, 6


@struct.dataclass
class Model:
    """Static physics model. Array fields are device constants."""

    # --- static structure (not traced) ---
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    nu: int = struct.field(pytree_node=False)
    nbody: int = struct.field(pytree_node=False)
    njnt: int = struct.field(pytree_node=False)
    ngeom: int = struct.field(pytree_node=False)
    ncontact: int = struct.field(pytree_node=False)  # static contact candidates
    nlimit: int = struct.field(pytree_node=False)  # limited slide/hinge joints
    timestep: float = struct.field(pytree_node=False)
    substeps: int = struct.field(pytree_node=False)  # internal substeps / step
    # per-joint static metadata (python tuples -> static under jit)
    jnt_type_t: tuple = struct.field(pytree_node=False)
    jnt_qposadr_t: tuple = struct.field(pytree_node=False)
    jnt_dofadr_t: tuple = struct.field(pytree_node=False)
    jnt_bodyid_t: tuple = struct.field(pytree_node=False)
    body_parent_t: tuple = struct.field(pytree_node=False)

    # --- arrays ---
    gravity: jnp.ndarray  # (3,)
    # bodies
    body_pos: jnp.ndarray  # (nbody, 3) frame offset in parent frame
    body_quat: jnp.ndarray  # (nbody, 4)
    body_mass: jnp.ndarray  # (nbody,)
    body_inertia: jnp.ndarray  # (nbody, 3) diagonal in inertial frame
    body_ipos: jnp.ndarray  # (nbody, 3) inertial frame offset in body frame
    body_iquat: jnp.ndarray  # (nbody, 4)
    # joints
    jnt_axis: jnp.ndarray  # (njnt, 3) in body frame
    jnt_pos: jnp.ndarray  # (njnt, 3) anchor in body frame
    jnt_range: jnp.ndarray  # (njnt, 2)
    jnt_limited: jnp.ndarray  # (njnt,) float 0/1
    jnt_stiffness: jnp.ndarray  # (njnt,)
    jnt_springref: jnp.ndarray  # (njnt,) radians / meters
    # dofs
    dof_damping: jnp.ndarray  # (nv,)
    dof_armature: jnp.ndarray  # (nv,)
    dof_jntid: jnp.ndarray  # (nv,) int
    # velocity-product mask: 0 for free-joint translation dofs, whose motion
    # subspace is world-fixed (S_dot = 0), 1 for all dofs fixed in the child
    # body (S_dot = v x S)
    dof_vp_mask: jnp.ndarray  # (nv,)
    # kinematic-tree root of each body (the first body under world on its
    # chain). Spatial quantities are referenced at the tree root's position
    # so float32 lever arms stay O(body size) no matter where the robot
    # wanders — a world-origin formulation loses catastrophically to
    # cancellation once |xpos| >> body extent.
    body_treeroot: jnp.ndarray  # (nbody,) int
    # ancestor mask: anc[i, j] = 1 if dof j is on the chain world->body i
    anc_mask: jnp.ndarray  # (nbody, nv)
    # dof-level ancestor mask: danc[j, j'] = 1 if dof j' acts at-or-before
    # dof j on its chain (strict body ancestors' dofs, plus same-body dofs
    # with index <= j). Used for the velocity-product bias: each dof's motion
    # subspace is fixed in the VIRTUAL frame after that dof, whose velocity
    # includes only the preceding dofs — using the full body velocity is
    # wrong for multi-joint bodies (walker hips carry 3 hinges in one body).
    dof_anc_mask: jnp.ndarray  # (nv, nv)
    # actuators
    actuator_gear: jnp.ndarray  # (nu,)
    actuator_dofadr: jnp.ndarray  # (nu,) int — dof index driven by actuator
    actuator_ctrlrange: jnp.ndarray  # (nu, 2)
    actuator_forcerange: jnp.ndarray  # (nu, 2)
    # geoms (for rendering / collision metadata)
    geom_bodyid: jnp.ndarray  # (ngeom,) int
    geom_pos: jnp.ndarray  # (ngeom, 3)
    geom_quat: jnp.ndarray  # (ngeom, 4)
    geom_size: jnp.ndarray  # (ngeom, 3)
    # static floor-contact candidates (see collision.py)
    con_bodyid: jnp.ndarray  # (ncontact,) int
    con_point: jnp.ndarray  # (ncontact, 3) offset in body frame
    con_radius: jnp.ndarray  # (ncontact,)
    con_friction: jnp.ndarray  # (ncontact,) sliding friction coefficient
    # pair margin (geom margin + floor margin): contact force activates when
    # dist < margin, matching MuJoCo includemargin semantics
    con_margin: jnp.ndarray  # (ncontact,)
    # contact impedance (MuJoCo solref-like): [timeconst, dampratio]
    con_solref: jnp.ndarray  # (2,)
    # joint-limit constraint rows (limited slide/hinge joints), resolved in
    # the same unilateral-constraint solve as contacts (constraints.py)
    lim_dofadr: jnp.ndarray  # (nlimit,) int
    lim_qposadr: jnp.ndarray  # (nlimit,) int
    lim_range: jnp.ndarray  # (nlimit, 2)
    total_mass: jnp.ndarray  # () scalar, sum of body masses
    # geom-pair contact candidates (sphere-sphere / sphere-box), static list
    # built at load time from contype/conaffinity (collision.py pair block).
    # GUARD robots have none (task geoms are contype=0); bench tasks opt in.
    # planar-3dof fast path (point robot): closed-form dynamics replace the
    # general FK/CRBA pipeline (pipeline._planar3_step). Constants are
    # static python floats so they fold into the compiled program.
    fastpath_planar3: bool = struct.field(pytree_node=False, default=False)
    fp_mass: float = struct.field(pytree_node=False, default=0.0)
    fp_izz: float = struct.field(pytree_node=False, default=0.0)
    fp_com: tuple = struct.field(pytree_node=False, default=(0.0, 0.0, 0.0))
    fp_z0: float = struct.field(pytree_node=False, default=0.0)
    # analytic sinusoidal terrain height h(x,y) = amp*sin(fx*x)*sin(fy*y)
    # replacing the flat floor in the contact depth/normal (rough-terrain
    # tasks; static => branch resolved at trace time, flat floor pays zero)
    terrain_amp: float = struct.field(pytree_node=False, default=0.0)
    terrain_fx: float = struct.field(pytree_node=False, default=1.0)
    terrain_fy: float = struct.field(pytree_node=False, default=1.0)
    npair: int = struct.field(pytree_node=False, default=0)
    pair_body_a: jnp.ndarray = None  # (npair,) int — sphere side
    pair_body_b: jnp.ndarray = None  # (npair,) int — sphere or box side
    pair_pos_a: jnp.ndarray = None  # (npair, 3) sphere center, body frame
    pair_pos_b: jnp.ndarray = None  # (npair, 3) other center, body frame
    pair_radius_a: jnp.ndarray = None  # (npair,)
    pair_is_box: jnp.ndarray = None  # (npair,) 1.0 if b is a box
    pair_size_b: jnp.ndarray = None  # (npair, 3) box half-sizes / [rb,0,0]
    pair_mat_b: jnp.ndarray = None  # (npair, 3, 3) box orientation, body frame
    pair_friction: jnp.ndarray = None  # (npair,)
    pair_margin: jnp.ndarray = None  # (npair,)


@struct.dataclass
class Data:
    """Dynamic physics state for ONE environment (vmap over leading axis)."""

    qpos: jnp.ndarray  # (nq,)
    qvel: jnp.ndarray  # (nv,)
    ctrl: jnp.ndarray  # (nu,)
    qacc: jnp.ndarray  # (nv,)
    xpos: jnp.ndarray  # (nbody, 3) body frame origins, world
    xquat: jnp.ndarray  # (nbody, 4)
    xmat: jnp.ndarray  # (nbody, 3, 3)
    xipos: jnp.ndarray  # (nbody, 3) body CoM, world


def _np(x):
    return np.asarray(x, dtype=np.float64)


def load_model(mj_model, substeps: int = 1, contact_solref=(0.02, 1.0),
               self_collision: bool = False, terrain=None) -> tuple:
    """Extract a device Model from a compiled mujoco.MjModel.

    Returns (model, meta) where meta is a host-side dict with name maps:
      body_name2id, jnt_name2qposadr, jnt_name2id — used by the env layer
      the same way the reference builds its maps (engine.py:302-316).
    """
    m = mj_model
    nbody, njnt, nv, nq, nu, ngeom = m.nbody, m.njnt, m.nv, m.nq, m.nu, m.ngeom

    jnt_type = [int(t) for t in m.jnt_type]
    jnt_bodyid = [int(b) for b in m.jnt_bodyid]
    jnt_qposadr = [int(a) for a in m.jnt_qposadr]
    jnt_dofadr = [int(a) for a in m.jnt_dofadr]
    body_parent = [int(p) for p in m.body_parentid]

    # dof -> joint map
    dof_jntid = np.asarray(m.dof_jntid, dtype=np.int32)
    dof_vp_mask = np.ones(nv, dtype=np.float32)
    for j in range(njnt):
        if jnt_type[j] == FREE:
            dof_vp_mask[jnt_dofadr[j]:jnt_dofadr[j] + 3] = 0.0

    # tree root of each body: walk up until the parent is world (body 0)
    treeroot = np.zeros(nbody, dtype=np.int32)
    for i in range(1, nbody):
        b = i
        while body_parent[b] != 0:
            b = body_parent[b]
        treeroot[i] = b

    # dof-level ancestor mask (see Model.dof_anc_mask)
    danc = np.zeros((nv, nv), dtype=np.float32)
    for j in range(nv):
        bj = jnt_bodyid[dof_jntid[j]]
        chain = set()
        b = int(body_parent[bj])
        while b != 0:
            chain.add(b)
            b = body_parent[b]
        for j2 in range(nv):
            b2 = jnt_bodyid[dof_jntid[j2]]
            # same-body joints count when they come at-or-before this dof's
            # JOINT (multi-dof joints like ball/free include all their own
            # columns — their subspace is fixed in the full child frame)
            if b2 in chain or (b2 == bj and dof_jntid[j2] <= dof_jntid[j]):
                danc[j, j2] = 1.0

    # ancestor mask over (body, dof): dof j affects body i iff the joint of j
    # belongs to a body on the chain from world to i.
    anc = np.zeros((nbody, nv), dtype=np.float32)
    for i in range(nbody):
        b = i
        chain = set()
        while b != 0:
            chain.add(b)
            b = body_parent[b]
        for j in range(nv):
            if jnt_bodyid[dof_jntid[j]] in chain:
                anc[i, j] = 1.0

    # actuators: only joint transmissions supported (all GUARD robots use
    # <motor>/<general gear=.. joint=..>; reference xmls/*.xml)
    act_dofadr = np.zeros(nu, dtype=np.int32)
    act_gear = np.zeros(nu, dtype=np.float32)
    for a in range(nu):
        jid = int(m.actuator_trnid[a, 0])
        act_dofadr[a] = jnt_dofadr[jid]
        act_gear[a] = float(m.actuator_gear[a, 0])
    ctrlrange = _np(m.actuator_ctrlrange).copy()
    ctrllimited = np.asarray(m.actuator_ctrllimited).astype(bool)
    ctrlrange[~ctrllimited] = np.array([-1e9, 1e9])
    forcerange = _np(m.actuator_forcerange).copy()
    forcelimited = np.asarray(m.actuator_forcelimited).astype(bool)
    forcerange[~forcelimited] = np.array([-1e9, 1e9])

    # static floor-contact candidates: every non-plane geom that can collide
    # with the floor plane (contype/conaffinity bitmask check, as MuJoCo does).
    # Capsules contribute their two cap centers as separate sphere contacts.
    floor_ids = [
        g for g in range(ngeom)
        if int(m.geom_type[g]) == GEOM_PLANE
    ]
    con_body, con_point, con_radius, con_fric, con_marg = [], [], [], [], []
    if floor_ids:
        f = floor_ids[0]
        f_con, f_aff = int(m.geom_contype[f]), int(m.geom_conaffinity[f])
        f_margin = float(m.geom_margin[f])
        for g in range(ngeom):
            if int(m.geom_type[g]) == GEOM_PLANE:
                continue
            g_con, g_aff = int(m.geom_contype[g]), int(m.geom_conaffinity[g])
            if not ((g_con & f_aff) or (f_con & g_aff)):
                continue
            bid = int(m.geom_bodyid[g])
            if bid == 0:
                continue
            gpos = _np(m.geom_pos[g])
            gquat = _np(m.geom_quat[g])
            size = _np(m.geom_size[g])
            fric = float(m.geom_friction[g, 0])
            gtype = int(m.geom_type[g])
            if gtype == GEOM_SPHERE:
                pts = [gpos]
                r = size[0]
            elif gtype == GEOM_CAPSULE:
                # cap centers at +- halflength along local z
                w, x, y, z = gquat
                # rotate (0,0,halflen) by gquat
                R = np.array([
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ])
                half = R @ np.array([0.0, 0.0, size[1]])
                pts = [gpos + half, gpos - half]
                r = size[0]
            elif gtype == GEOM_BOX:
                # 4 bottom corners (approximate box-floor contact)
                w, x, y, z = gquat
                R = np.array([
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ])
                pts = []
                for sx in (-1, 1):
                    for sy in (-1, 1):
                        corner = R @ (size * np.array([sx, sy, -1.0]))
                        pts.append(gpos + corner)
                r = 0.0
            else:
                # cylinder / ellipsoid: treat as sphere at geom center
                pts = [gpos]
                r = float(np.min(size[size > 0])) if np.any(size > 0) else 0.0
            # pair margin = this geom's margin + the floor's margin
            # (MuJoCo includemargin, verified empirically: margins add)
            marg = float(m.geom_margin[g]) + f_margin
            for p in pts:
                con_body.append(bid)
                con_point.append(p)
                con_radius.append(r)
                con_fric.append(fric)
                con_marg.append(marg)

    terrain_amp, terrain_fx, terrain_fy = (0.0, 1.0, 1.0) if terrain is None else terrain

    # static prune: drop candidates that can NEVER activate. If every joint
    # on the chain world->body preserves world z (horizontal slide, or hinge
    # about exactly +-z, with unrotated body frames), the contact point's
    # height is an invariant of the dynamics; if its depth at qpos0 is
    # already <= 0 it stays inactive forever. This keeps the flagship
    # point robot (slide-slide-yaw, sphere resting exactly at z=radius)
    # entirely contact-free, so the constraint solve never runs there.
    if con_body and terrain_amp == 0.0:
        import mujoco  # host-side MJCF compiler only (module docstring)

        d0 = mujoco.MjData(m)
        mujoco.mj_forward(m, d0)

        def _z_invariant(bid_):
            b = bid_
            while b != 0:
                if abs(float(np.linalg.norm(m.body_quat[b] - np.array([1, 0, 0, 0])))) > 1e-9:
                    return False
                for j in range(njnt):
                    if jnt_bodyid[j] != b:
                        continue
                    ax = _np(m.jnt_axis[j])
                    if jnt_type[j] == SLIDE and abs(ax[2]) < 1e-9:
                        continue
                    if jnt_type[j] == HINGE and abs(ax[0]) < 1e-9 and abs(ax[1]) < 1e-9:
                        continue
                    return False
                b = body_parent[b]
            return True

        keep = []
        for i, bid in enumerate(con_body):
            z = float(
                d0.xpos[bid][2]
                + (d0.xmat[bid].reshape(3, 3) @ con_point[i])[2]
            )
            depth0 = con_radius[i] + con_marg[i] - z
            if depth0 <= 0.0 and _z_invariant(bid):
                continue
            keep.append(i)
        con_body = [con_body[i] for i in keep]
        con_point = [con_point[i] for i in keep]
        con_radius = [con_radius[i] for i in keep]
        con_fric = [con_fric[i] for i in keep]
        con_marg = [con_marg[i] for i in keep]

    ncontact = len(con_body)
    if ncontact == 0:
        con_body = [0]
        con_point = [np.zeros(3)]
        con_radius = [0.0]
        con_fric = [0.0]
        con_marg = [0.0]
        ncontact_arr = 0
    else:
        ncontact_arr = ncontact

    # geom-pair contact candidates: sphere(/capsule-cap)-vs-sphere and
    # sphere-vs-box pairs between distinct, non-parent-child bodies whose
    # contype/conaffinity masks allow collision (MuJoCo pair filtering,
    # including the default filterparent rule). Static list; other geom-type
    # pairs are not supported (GUARD/bench tasks only need these).
    pr_ba, pr_bb, pr_pa, pr_pb, pr_ra = [], [], [], [], []
    pr_box, pr_sb, pr_mb, pr_fric, pr_marg = [], [], [], [], []

    def _quat_mat(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    def _sphere_points(g):
        """(points, radius) for a geom treated as one or more spheres.
        Boxes contribute their 8 corners (radius 0) — the same sampling the
        floor path uses, enabling box-box pairs (cube resting on a palm)."""
        gtype = int(m.geom_type[g])
        gpos = _np(m.geom_pos[g])
        size = _np(m.geom_size[g])
        if gtype == GEOM_SPHERE:
            return [gpos], float(size[0])
        if gtype == GEOM_CAPSULE:
            Rg = _quat_mat(_np(m.geom_quat[g]))
            half = Rg @ np.array([0.0, 0.0, size[1]])
            return [gpos + half, gpos - half], float(size[0])
        if gtype == GEOM_BOX:
            Rg = _quat_mat(_np(m.geom_quat[g]))
            pts = [
                gpos + Rg @ (size * np.array([sx, sy, sz]))
                for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
            ]
            return pts, 0.0
        return None, 0.0

    for ga in range(ngeom):
        for gb in range(ngeom):
            ta, tb = int(m.geom_type[ga]), int(m.geom_type[gb])
            if ta in (GEOM_PLANE, GEOM_HFIELD) or tb == GEOM_PLANE or tb == GEOM_HFIELD:
                continue
            # a must be sphere-like (box corners count); b sphere-like or
            # box. Each unordered pair appears once — except box-box, where
            # BOTH directions contribute (corners of each box against the
            # other, the standard point-sampled box-box treatment).
            if tb == GEOM_BOX:
                if ta not in (GEOM_SPHERE, GEOM_CAPSULE, GEOM_BOX):
                    continue
            elif ta in (GEOM_SPHERE, GEOM_CAPSULE) and tb in (GEOM_SPHERE, GEOM_CAPSULE):
                if ga >= gb:
                    continue
            else:
                continue
            ba_, bb_ = int(m.geom_bodyid[ga]), int(m.geom_bodyid[gb])
            if ba_ == bb_:
                continue
            # skip pairs where neither side has any dof on its chain
            # (static-static: zero Jacobian, can never produce force)
            if not (anc[ba_].any() or anc[bb_].any()):
                continue
            # same-tree (self-)collision is opt-in: leg-vs-leg candidate
            # lists grow O(ngeom^2) (doggo: 312 rows) for contacts that
            # barely occur; cross-tree contacts (robot-vs-object) are the
            # ones that carry task dynamics
            if (not self_collision and ba_ != 0 and bb_ != 0
                    and treeroot[ba_] == treeroot[bb_]):
                continue
            # filterparent: skip parent-child body pairs (MuJoCo default)
            if body_parent[ba_] == bb_ or body_parent[bb_] == ba_:
                continue
            ca, aa = int(m.geom_contype[ga]), int(m.geom_conaffinity[ga])
            cb, ab = int(m.geom_contype[gb]), int(m.geom_conaffinity[gb])
            if not ((ca & ab) or (cb & aa)):
                continue
            pts_a, ra = _sphere_points(ga)
            if pts_a is None:
                continue
            marg = float(m.geom_margin[ga]) + float(m.geom_margin[gb])
            fric = min(float(m.geom_friction[ga, 0]), float(m.geom_friction[gb, 0]))
            if tb == GEOM_BOX:
                for pa in pts_a:
                    pr_ba.append(ba_); pr_bb.append(bb_)
                    pr_pa.append(pa); pr_pb.append(_np(m.geom_pos[gb]))
                    pr_ra.append(ra); pr_box.append(1.0)
                    pr_sb.append(_np(m.geom_size[gb]))
                    pr_mb.append(_quat_mat(_np(m.geom_quat[gb])))
                    pr_fric.append(fric); pr_marg.append(marg)
            else:
                pts_b, rb = _sphere_points(gb)
                for pa in pts_a:
                    for pb in pts_b:
                        pr_ba.append(ba_); pr_bb.append(bb_)
                        pr_pa.append(pa); pr_pb.append(pb)
                        pr_ra.append(ra); pr_box.append(0.0)
                        pr_sb.append(np.array([rb, 0.0, 0.0]))
                        pr_mb.append(np.eye(3))
                        pr_fric.append(fric); pr_marg.append(marg)

    npair = len(pr_ba)
    if npair == 0:
        pr_ba, pr_bb, pr_pa, pr_pb = [0], [0], [np.zeros(3)], [np.zeros(3)]
        pr_ra, pr_box, pr_sb = [0.0], [0.0], [np.zeros(3)]
        pr_mb, pr_fric, pr_marg = [np.eye(3)], [0.0], [0.0]

    # joint-limit constraint rows: limited slide/hinge joints
    lim_dofadr, lim_qposadr, lim_range = [], [], []
    for j in range(njnt):
        if jnt_type[j] in (SLIDE, HINGE) and bool(m.jnt_limited[j]):
            lim_dofadr.append(jnt_dofadr[j])
            lim_qposadr.append(jnt_qposadr[j])
            lim_range.append(_np(m.jnt_range[j]))
    nlimit = len(lim_dofadr)
    if nlimit == 0:
        lim_dofadr, lim_qposadr, lim_range = [0], [0], [np.zeros(2)]

    # planar-3dof fast-path detection: one moving body on a
    # [slide-x, slide-y, hinge-z] chain anchored at the body origin, no
    # constraints of any kind, no springs, unrotated body frame. Exactly
    # the GUARD point robot (xmls/point.xml). Closed-form dynamics
    # (pipeline._planar3_step) then replace the general FK/CRBA pipeline —
    # ~40 ops instead of ~1400 in the per-step program.
    fastpath = (
        nbody == 2 and njnt == 3 and nv == 3
        and ncontact_arr == 0 and nlimit == 0 and npair == 0
        and terrain_amp == 0.0
        and jnt_type == [SLIDE, SLIDE, HINGE]
        and jnt_bodyid == [1, 1, 1]
        and np.allclose(_np(m.jnt_axis), np.eye(3), atol=1e-9)
        and np.allclose(_np(m.jnt_pos), 0.0, atol=1e-9)
        and np.allclose(_np(m.jnt_stiffness), 0.0, atol=1e-12)
        and np.allclose(_np(m.body_quat[1]), [1, 0, 0, 0], atol=1e-9)
        and np.allclose(_np(m.opt.gravity[:2]), 0.0, atol=1e-12)
    )
    if fastpath:
        iq = _np(m.body_iquat[1])
        Ri = np.array([
            [1 - 2 * (iq[2] ** 2 + iq[3] ** 2),
             2 * (iq[1] * iq[2] - iq[0] * iq[3]),
             2 * (iq[1] * iq[3] + iq[0] * iq[2])],
            [2 * (iq[1] * iq[2] + iq[0] * iq[3]),
             1 - 2 * (iq[1] ** 2 + iq[3] ** 2),
             2 * (iq[2] * iq[3] - iq[0] * iq[1])],
            [2 * (iq[1] * iq[3] - iq[0] * iq[2]),
             2 * (iq[2] * iq[3] + iq[0] * iq[1]),
             1 - 2 * (iq[1] ** 2 + iq[2] ** 2)],
        ])
        I_world = Ri @ np.diag(_np(m.body_inertia[1])) @ Ri.T
        fp_izz = float(I_world[2, 2])
        fp_mass = float(m.body_mass[1])
        fp_com = tuple(float(v) for v in _np(m.body_ipos[1]))
        fp_z0 = float(m.body_pos[1, 2])
    else:
        fp_izz = fp_mass = fp_z0 = 0.0
        fp_com = (0.0, 0.0, 0.0)

    f32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32)
    i32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.int32)

    model = Model(
        nq=nq, nv=nv, nu=nu, nbody=nbody, njnt=njnt, ngeom=ngeom,
        ncontact=ncontact_arr,
        nlimit=nlimit,
        timestep=float(m.opt.timestep),
        substeps=int(substeps),
        jnt_type_t=tuple(jnt_type),
        jnt_qposadr_t=tuple(jnt_qposadr),
        jnt_dofadr_t=tuple(jnt_dofadr),
        jnt_bodyid_t=tuple(jnt_bodyid),
        body_parent_t=tuple(body_parent),
        gravity=f32(m.opt.gravity),
        body_pos=f32(m.body_pos),
        body_quat=f32(m.body_quat),
        body_mass=f32(m.body_mass),
        body_inertia=f32(m.body_inertia),
        body_ipos=f32(m.body_ipos),
        body_iquat=f32(m.body_iquat),
        jnt_axis=f32(m.jnt_axis),
        jnt_pos=f32(m.jnt_pos),
        jnt_range=f32(m.jnt_range),
        jnt_limited=f32(np.asarray(m.jnt_limited, dtype=np.float32)),
        jnt_stiffness=f32(m.jnt_stiffness),
        jnt_springref=f32(_springref(m)),
        dof_damping=f32(m.dof_damping),
        dof_armature=f32(m.dof_armature),
        dof_jntid=i32(dof_jntid),
        dof_vp_mask=f32(dof_vp_mask),
        body_treeroot=i32(treeroot),
        anc_mask=f32(anc),
        dof_anc_mask=f32(danc),
        actuator_gear=f32(act_gear),
        actuator_dofadr=i32(act_dofadr),
        actuator_ctrlrange=f32(ctrlrange),
        actuator_forcerange=f32(forcerange),
        geom_bodyid=i32(m.geom_bodyid),
        geom_pos=f32(m.geom_pos),
        geom_quat=f32(m.geom_quat),
        geom_size=f32(m.geom_size),
        con_bodyid=i32(con_body),
        con_point=f32(con_point),
        con_radius=f32(con_radius),
        con_friction=f32(con_fric),
        con_margin=f32(con_marg),
        con_solref=f32(contact_solref),
        lim_dofadr=i32(lim_dofadr),
        lim_qposadr=i32(lim_qposadr),
        lim_range=f32(lim_range),
        terrain_amp=float(terrain_amp),
        terrain_fx=float(terrain_fx),
        terrain_fy=float(terrain_fy),
        fastpath_planar3=bool(fastpath),
        fp_mass=fp_mass,
        fp_izz=fp_izz,
        fp_com=fp_com,
        fp_z0=fp_z0,
        npair=npair,
        pair_body_a=i32(pr_ba),
        pair_body_b=i32(pr_bb),
        pair_pos_a=f32(pr_pa),
        pair_pos_b=f32(pr_pb),
        pair_radius_a=f32(pr_ra),
        pair_is_box=f32(pr_box),
        pair_size_b=f32(pr_sb),
        pair_mat_b=f32(pr_mb),
        pair_friction=f32(pr_fric),
        pair_margin=f32(pr_marg),
        total_mass=f32(np.sum(m.body_mass)),
    )

    meta = {
        "body_name2id": {m.body(i).name: i for i in range(nbody)},
        "jnt_name2id": {m.jnt(i).name: i for i in range(njnt)},
        "jnt_name2qposadr": {m.jnt(i).name: jnt_qposadr[i] for i in range(njnt)},
        "geom_name2id": {m.geom(i).name: i for i in range(ngeom)},
    }
    return model, meta


def _springref(m):
    """Per-joint spring reference in qpos units (radians for hinges).

    MuJoCo stores springref resolved into qpos_spring; read it back per joint.
    """
    out = np.zeros(m.njnt, dtype=np.float32)
    for j in range(m.njnt):
        t = int(m.jnt_type[j])
        if t in (SLIDE, HINGE):
            out[j] = float(m.qpos_spring[int(m.jnt_qposadr[j])])
    return out


def make_data(model: Model, qpos0=None) -> Data:
    """Fresh single-env Data at qpos0 (or zeros with unit quaternions)."""
    nq, nv, nu, nbody = model.nq, model.nv, model.nu, model.nbody
    if qpos0 is None:
        qpos = np.zeros(nq, dtype=np.float32)
        for j, t in enumerate(model.jnt_type_t):
            if t in (FREE, BALL):
                adr = model.jnt_qposadr_t[j] + (3 if t == FREE else 0)
                qpos[adr] = 1.0  # identity quaternion w component
        qpos = jnp.asarray(qpos)
    else:
        qpos = jnp.asarray(qpos0, dtype=jnp.float32)
    return Data(
        qpos=qpos,
        qvel=jnp.zeros(nv, dtype=jnp.float32),
        ctrl=jnp.zeros(nu, dtype=jnp.float32),
        qacc=jnp.zeros(nv, dtype=jnp.float32),
        xpos=jnp.zeros((nbody, 3), dtype=jnp.float32),
        xquat=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=jnp.float32), (nbody, 1)),
        xmat=jnp.tile(jnp.eye(3, dtype=jnp.float32), (nbody, 1, 1)),
        xipos=jnp.zeros((nbody, 3), dtype=jnp.float32),
    )
