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
    # contact impedance (MuJoCo solref-like): [timeconst, dampratio]
    con_solref: jnp.ndarray  # (2,)
    total_mass: jnp.ndarray  # () scalar, sum of body masses


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


def load_model(mj_model, substeps: int = 1, contact_solref=(0.02, 1.0)) -> tuple:
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
    con_body, con_point, con_radius, con_fric = [], [], [], []
    if floor_ids:
        f = floor_ids[0]
        f_con, f_aff = int(m.geom_contype[f]), int(m.geom_conaffinity[f])
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
            for p in pts:
                con_body.append(bid)
                con_point.append(p)
                con_radius.append(r)
                con_fric.append(fric)

    ncontact = len(con_body)
    if ncontact == 0:
        con_body = [0]
        con_point = [np.zeros(3)]
        con_radius = [0.0]
        con_fric = [0.0]
        ncontact_arr = 0
    else:
        ncontact_arr = ncontact

    f32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32)
    i32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.int32)

    model = Model(
        nq=nq, nv=nv, nu=nu, nbody=nbody, njnt=njnt, ngeom=ngeom,
        ncontact=ncontact_arr,
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
        con_solref=f32(contact_solref),
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
