"""TPU-native benchmark (non-safety) tasks.

The reference satisfies non-safety benchmark workloads by consuming the
vendored NVIDIA IsaacGymEnvs suite through ``isaacgymenvs.make``
(reference: train.py:7-14, safe_rl_libX/guard_utils/
safe_rl_env_config.py:2597-2626) — an external PhysX binary that cannot
exist on a TPU host. This module implements the classic benchmark tasks
natively on the guardx_tpu physics engine, behind the exact surface the
trainers consume (functional reset/step/reset_done + ``info['cost']`` ≡ 0,
matching IsaacGymWrapper's zero-cost padding at
safe_rl_env_config.py:2640-2644), so the corresponding registry names run
on TPU with no external dependency:

    Cartpole      — cart/pole balance      (IsaacGymEnvs tasks/cartpole.py)
    Ant           — quadruped locomotion   (IsaacGymEnvs tasks/ant.py)
    Humanoid      — biped locomotion       (IsaacGymEnvs tasks/humanoid.py)
    Anymal        — quadruped locomotion   (IsaacGymEnvs tasks/anymal.py;
                                            doggo morphology)
    AnymalTerrain — velocity-command following on rough ground
                    (IsaacGymEnvs tasks/anymal_terrain.py; analytic
                     sinusoidal terrain in the contact solve)
    Quadcopter    — hover-to-target        (IsaacGymEnvs tasks/quadcopter.py)
    BallBalance   — tilt a tray to center a free ball
                    (IsaacGymEnvs tasks/ball_balance.py; sphere-box pair)
    FrankaCabinet — fixed-base 6-dof arm opens a sliding drawer by its
                    handle (IsaacGymEnvs tasks/franka_cabinet.py;
                    end-effector/handle sphere-box pair)
    Trifinger     — three 3-dof fingers reposition a free cube to a target
                    (IsaacGymEnvs tasks/trifinger.py; fingertip-cube
                    sphere-box pairs + cube-floor corners)
    AllegroHand   — four-finger in-hand cube yaw reorientation on an
                    upward palm (IsaacGymEnvs tasks/allegro_hand.py;
                    fingertip-cube pairs + cube-palm box-box corners)
    ShadowHand(+OpenAI_FF) — five-finger in-hand cube reorientation to a
                    full target quaternion (IsaacGymEnvs
                    tasks/shadow_hand.py, the OpenAI cube task)

    AllegroKukaLSTM — 7-dof arm + 4-finger hand regrasping: approach,
                    grasp, lift a free cube to an in-air target that
                    respawns on success (IsaacGymEnvs tasks/allegro_kuka/
                    allegro_kuka_regrasping.py); trained with the
                    recurrent (LSTM) policy the registry name implies
    AllegroKukaTwoArmsLSTM — two mirrored arm+hand rigs over one
                    workspace, target volume spanning both reaches
                    (tasks/allegro_kuka/allegro_kuka_two_arms_regrasping
                    .py — the reference README's flagship example)
    AllegroHandDextremeADR — AllegroHand reorientation under automatic
                    domain randomization (tasks/dextreme/; envs/randomize)

Beyond the 16 registry names, two vendored IsaacGymEnvs tasks:

    HumanoidAMP   — the canonical AMP environment: 28-dof humanoid, PD
                    position control, mocap reference-state init, 105-dim
                    AMP feature observation (tasks/humanoid_amp.py;
                    envs/humanoid_amp.py + utils/poselib.py)
    FrankaCubeStack — 7-dof arm + 2-finger gripper stacks a 5 cm cube on
                    a 7 cm cube through box-box pair contacts
                    (tasks/franka_cube_stack.py)

Every IsaacGym registry name now runs natively on TPU; the external-
binary adapter (guardx_tpu.envs.wrappers, GUARDX_ISAAC_BINARY=1) remains
available for GPU hosts with a real Isaac install.

The reward structures follow the IsaacGym task definitions (progress +
alive - energy for locomotion; angle/velocity penalties for cartpole;
inverse-distance hover for quadcopter) re-derived for these robot models;
no reference code is copied.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

import mujoco

from guardx_tpu import physics
from guardx_tpu.envs import randomize
from guardx_tpu.envs.world import BASE_DIR
from guardx_tpu.envs.engine import LayoutPool
from guardx_tpu.utils.spaces import Box


@struct.dataclass
class BenchState:
    """Per-environment state for a benchmark task (vmap the leading axis)."""

    data: physics.Data
    target: jnp.ndarray  # (4,) task target (point / commands / yaw / quat)
    steps: jnp.ndarray  # () int32
    rng: jnp.ndarray
    # task-specific reward trackers (AUX_SIZE floats; AllegroKuka uses
    # closest-fingertip dists, lifted flag, closest keypoint dist,
    # near-goal steps, success count, object spawn height)
    aux: jnp.ndarray
    # domain-randomization block: per-env ranges + current multipliers
    # (envs/randomize.py; identity when the task has DR disabled)
    dr: dict


class _TaskSpec:
    def __init__(self, xml, reset_noise=0.05, z_lo=None, z_hi=None,
                 forward_scale=1.0, alive_bonus=0.5, energy_cost=0.005,
                 kind='locomotion', terrain=None, substeps=None, dr=False,
                 target_volume=None, solref=None):
        self.xml = xml
        self.reset_noise = reset_noise
        self.z_lo, self.z_hi = z_lo, z_hi
        self.forward_scale = forward_scale
        self.alive_bonus = alive_bonus
        self.energy_cost = energy_cost
        self.kind = kind
        self.terrain = terrain
        self.substeps = substeps
        self.dr = dr
        # kuka target volume (lo, hi) corners; None = single-arm default
        self.target_volume = target_volume
        # contact solref override (timeconst, dampratio); None = default.
        # Grasping tasks need stiffer contacts than locomotion: at the
        # default 0.02 s timeconst a 10 N pinch interpenetrates a light
        # cube by centimeters, flipping box-face normals and ejecting it
        self.solref = solref


TASKS = {
    # fall thresholds as fractions of the standing root height
    'Cartpole': _TaskSpec('cartpole.xml', reset_noise=0.08, kind='cartpole'),
    'Ant': _TaskSpec('ant.xml', z_lo=0.26, z_hi=2.0),
    'Humanoid': _TaskSpec('humanoid.xml', z_lo=0.8, z_hi=2.5,
                          alive_bonus=2.0, energy_cost=0.003),
    'Anymal': _TaskSpec('doggo.xml', z_lo=0.12, z_hi=1.0),
    'AnymalTerrain': _TaskSpec('doggo.xml', z_lo=0.10, z_hi=1.0,
                               kind='command', terrain=(0.04, 4.0, 4.0),
                               substeps=4),
    'Quadcopter': _TaskSpec('drone.xml', kind='hover'),
    'BallBalance': _TaskSpec('ballbalance.xml', reset_noise=0.02,
                             kind='balance', substeps=2),
    'FrankaCabinet': _TaskSpec('cabinet.xml', reset_noise=0.05,
                               kind='cabinet', substeps=2),
    'Trifinger': _TaskSpec('trifinger.xml', reset_noise=0.05,
                           kind='trifinger', substeps=2),
    'AllegroHand': _TaskSpec('allegro.xml', reset_noise=0.03,
                             kind='inhand', substeps=2),
    'ShadowHand': _TaskSpec('shadow.xml', reset_noise=0.03,
                            kind='inhand_quat', substeps=2),
    # AllegroKuka regrasping: approach -> grasp -> lift -> hold at an
    # in-air target that respawns on success (IsaacGymEnvs
    # tasks/allegro_kuka/allegro_kuka_regrasping.py; reward structure and
    # scales per allegro_kuka_base.py:759-905 + cfg/task/AllegroKuka.yaml).
    # The LSTM registry name selects a recurrent policy in the Trainer.
    'AllegroKukaLSTM': _TaskSpec('kuka_allegro.xml', reset_noise=0.04,
                                 kind='kuka', substeps=2),
    # two mirrored arms sharing one workspace; the target volume spans
    # BOTH arms' reach so far-side targets need a handover
    # (allegro_kuka_two_arms_regrasping.py; the reference README's
    # flagship example, /root/reference/train.py:7-14)
    'AllegroKukaTwoArmsLSTM': _TaskSpec(
        'kuka_allegro_two.xml', reset_noise=0.04, kind='kuka', substeps=2,
        target_volume=([-0.25, -0.55, 0.2], [0.25, 0.55, 0.5]),
    ),
    # Dextreme: AllegroHand in-hand reorientation under Automatic Domain
    # Randomization (tasks/dextreme/allegro_hand_dextreme.py +
    # adr_vec_task.py); DR multipliers live in BenchState.dr, the ADR
    # boundary loop runs between epochs (envs/randomize.py.ADRManager,
    # wired in train.py)
    'AllegroHandDextremeADR': _TaskSpec('allegro.xml', reset_noise=0.03,
                                        kind='inhand', substeps=2, dr=True),
    # HumanoidAMP: the reference's canonical AMP environment (vendored
    # IsaacGymEnvs tasks/humanoid_amp.py + tasks/amp/humanoid_amp_base.py;
    # not one of the 16 guardX registry names). 28-dof humanoid under PD
    # position control, constant task reward, early termination below
    # terminationHeight, reference-state init from real mocap frames;
    # observation = the 105-dim AMP feature vector. Model timestep 1/120
    # with 4 PD control substeps = 30 Hz control (HumanoidAMP.yaml dt
    # 0.0166 / controlFrequencyInv 2). See envs/humanoid_amp.py.
    'HumanoidAMP': _TaskSpec('amp_humanoid.xml', kind='humanoid_amp',
                             substeps=1),
    # FrankaCubeStack: 7-dof fixed arm + 2-finger gripper stacks a 5 cm
    # cube onto a 7 cm cube (vendored IsaacGymEnvs
    # tasks/franka_cube_stack.py; reward structure
    # compute_franka_reward:698-747, scales cfg/task/FrankaCubeStack.yaml:
    # dist 0.1 / lift 1.5 / align 2.0 / stack 16.0). Grasp + stack run
    # through box-box corner pair contacts — the hardest contact workload
    # in the suite.
    'FrankaCubeStack': _TaskSpec('cube_stack.xml', reset_noise=0.04,
                                 kind='cube_stack', substeps=4),
}
# the OpenAI_FF / OpenAI_LSTM variants are the same env trained with a
# feedforward / LSTM policy (reference rl_games configs,
# safe_rl_env_config.py:2455-2566); the policy architecture is a Trainer
# property here (train.py auto-enables --recurrent for *LSTM task names)
TASKS['ShadowHandOpenAI_FF'] = TASKS['ShadowHand']
TASKS['ShadowHandOpenAI_LSTM'] = TASKS['ShadowHand']

CARTPOLE_RESET_DIST = 3.0


class NativeBenchEngine:
    """Batched benchmark env with the Engine surface the Trainer binds to:
    ``make_layout_pool`` / ``reset_single`` / ``step_single`` /
    ``reset_done_single`` plus the stateful gym-flavored batch API."""

    def __init__(self, task_name: str, env_num: int = 1, num_steps: int = 500,
                 seed: int = 0, motion_files=None):
        if task_name not in TASKS:
            raise ValueError(
                f"no native implementation for '{task_name}'; native tasks: "
                f"{sorted(TASKS)} (others need the IsaacGym adapter)"
            )
        self.task_name = task_name
        self.spec = spec = TASKS[task_name]
        self.env_num = env_num
        self.num_steps = num_steps
        self._seed = seed

        self.mj_model = mujoco.MjModel.from_xml_path(
            os.path.join(BASE_DIR, spec.xml)
        )
        from guardx_tpu.envs.engine import Engine

        substeps = spec.substeps or Engine.ROBOT_SUBSTEPS.get(spec.xml, 4)
        extra_kw = {}
        if spec.solref is not None:
            extra_kw['contact_solref'] = spec.solref
        self.model, self.meta = physics.load_model(
            self.mj_model, substeps=substeps, terrain=spec.terrain,
            **extra_kw,
        )
        self.body_robot = self.meta['body_name2id']['robot']
        self.dt = self.model.timestep

        self._free = 'robot' in self.meta['jnt_name2qposadr']
        self._qpos0 = jnp.asarray(self.mj_model.qpos0, dtype=jnp.float32)
        # domain randomization (envs/randomize.py); adr_enabled tells
        # train.py to run the ADR boundary loop between epochs
        self.dr_enabled = bool(spec.dr)
        self.adr_enabled = bool(spec.dr)

        if spec.kind == 'balance':
            self._ball_adr = self.meta['jnt_name2qposadr']['ball']
            self._ball_body = self.meta['body_name2id']['ball']
        if spec.kind in ('trifinger', 'inhand', 'inhand_quat'):
            self._cube_adr = self.meta['jnt_name2qposadr']['cube']
            self._tips = []
            n_f = {'trifinger': 3, 'inhand': 4, 'inhand_quat': 5}[spec.kind]
            for i in range(n_f):
                gid = self.meta['geom_name2id'][f'f{i}_tip']
                self._tips.append((
                    int(self.mj_model.geom_bodyid[gid]),
                    jnp.asarray(self.mj_model.geom_pos[gid], jnp.float32),
                ))
        if spec.kind == 'kuka':
            self._cube_adr = self.meta['jnt_name2qposadr']['cube']
            self._tips = []
            i = 0
            while f'f{i}_tip' in self.meta['geom_name2id']:
                gid = self.meta['geom_name2id'][f'f{i}_tip']
                self._tips.append((
                    int(self.mj_model.geom_bodyid[gid]),
                    jnp.asarray(self.mj_model.geom_pos[gid], jnp.float32),
                ))
                i += 1
            self._n_arms = len(self._tips) // 4
            # bent ready pose over the cube (see kuka_allegro.xml header);
            # every arm (suffix _b for the second) bends identically
            qinit = np.array(self.mj_model.qpos0, dtype=np.float32)
            for base, v in (('kj2', 0.873), ('kj4', 1.047), ('kj6', 0.524)):
                for jname in (base, base + '_b'):
                    if jname in self.meta['jnt_name2qposadr']:
                        qinit[self.meta['jnt_name2qposadr'][jname]] = v
            self._kuka_qinit = jnp.asarray(qinit)
        if spec.kind == 'humanoid_amp':
            from guardx_tpu.envs import humanoid_amp as ha
            from guardx_tpu.utils import poselib

            # 4 physics substeps per control step, PD torque recomputed at
            # every substep (IsaacGym evaluates PhysX joint drives each sim
            # substep; a 30 Hz zero-order hold would chatter at the ankle
            # gains) — HumanoidAMP.yaml dt 0.0166 / controlFrequencyInv 2
            self.control_substeps = 4
            self.control_dt = self.model.timestep * self.control_substeps
            files = motion_files or poselib.default_motion_files()
            self.motion_lib = poselib.MotionLib(files)
            self._motion_qpos = jnp.asarray(self.motion_lib.qpos)
            self._motion_qvel = jnp.asarray(self.motion_lib.qvel)
            # per-dof joint ranges (the 28 actuated hinges follow the free
            # root: qpos 7..35, dofs 6..34 in declaration order)
            jr = np.zeros((ha.NUM_DOF, 2), np.float64)
            for j in range(1, self.mj_model.njnt):
                dadr = int(self.mj_model.jnt_dofadr[j]) - 6
                jr[dadr] = self.mj_model.jnt_range[j]
            self._pd_kp, self._pd_kd, self._pd_offset, self._pd_scale = (
                jnp.asarray(x) for x in ha.pd_tables(jr)
            )
            self._amp_gear = jnp.asarray(
                np.asarray(self.model.actuator_gear), jnp.float32
            )
            self._key_body_ids = jnp.asarray([
                self.meta['body_name2id'][n] for n in ha.KEY_BODIES
            ])
            # ctrl index i drives dof 6+i (motors declared in joint order)
            assert np.array_equal(
                np.asarray(self.model.actuator_dofadr),
                np.arange(6, 6 + ha.NUM_DOF),
            )
            # per-frame demo AMP observations through the env's OWN
            # FK/observation path (one batched call) so demo and policy
            # features are the same manifold by construction — see
            # utils/poselib.MotionLib.demo_pairs
            def _frame_obs(qp, qv):
                d = physics.make_data(self.model)
                d = d.replace(qpos=qp, qvel=qv)
                return self._humanoid_amp_obs(physics.forward(self.model, d))

            self._motion_amp_obs = np.asarray(jax.jit(jax.vmap(_frame_obs))(
                self._motion_qpos, self._motion_qvel
            ))
        if spec.kind == 'cube_stack':
            self._cubeA_adr = self.meta['jnt_name2qposadr']['cubeA']
            self._cubeB_adr = self.meta['jnt_name2qposadr']['cubeB']
            for attr, gname in (('_ee', 'end_effector'),
                                ('_pad_l', 'pad_l'), ('_pad_r', 'pad_r')):
                gid = self.meta['geom_name2id'][gname]
                setattr(self, attr, (
                    int(self.mj_model.geom_bodyid[gid]),
                    jnp.asarray(self.mj_model.geom_pos[gid], jnp.float32),
                ))
            # half sizes (reference full sizes 0.050 / 0.070,
            # franka_cube_stack.py:223-224)
            self._szA, self._szB = 0.025, 0.035
            # crouched ready pose over the workspace
            qinit = np.array(self.mj_model.qpos0, dtype=np.float32)
            for jname, v in (('fj2', 0.8), ('fj4', 1.7), ('fj6', 0.7)):
                qinit[self.meta['jnt_name2qposadr'][jname]] = v
            self._stack_qinit = jnp.asarray(qinit)
        if spec.kind == 'cabinet':
            self._drawer_adr = self.meta['jnt_name2qposadr']['drawer_slide']
            # (body id, body-frame offset) pairs, resolved on the host
            for attr, gname in (('_ee', 'end_effector'),
                                ('_handle', 'drawer_handle')):
                gid = self.meta['geom_name2id'][gname]
                setattr(self, attr, (
                    int(self.mj_model.geom_bodyid[gid]),
                    jnp.asarray(self.mj_model.geom_pos[gid], jnp.float32),
                ))

        self.obs_flat_size = self._obs_size()
        self.observation_space = Box(
            -np.inf, np.inf, (self.obs_flat_size,), np.float32
        )
        nu = self.model.nu
        self.action_space = Box(-1.0, 1.0, (nu,), np.float32)

        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._obs = None

        self._make_pool = jax.jit(self.make_layout_pool)
        self._reset = jax.jit(jax.vmap(self.reset_single, in_axes=(0, None)))
        self._step = jax.jit(jax.vmap(self.step_single))
        self._reset_done = jax.jit(
            jax.vmap(self.reset_done_single, in_axes=(0, 0, 0, None))
        )

    # -- layout-pool protocol (no layouts to sample: a unit dummy pool) ----

    uses_layout_pool = False  # runner skips the pool-validity check

    def make_layout_pool(self, rng) -> LayoutPool:
        return LayoutPool(
            placed=jnp.zeros((1, 1, 2), jnp.float32),
            n_valid=jnp.int32(1),
        )

    # -- observations ------------------------------------------------------

    def _geom_world(self, data, ref):
        b, off = ref
        return data.xpos[b] + data.xmat[b] @ off

    def _obs_size(self):
        if self.spec.kind == 'cartpole':
            return 4
        if self.spec.kind == 'humanoid_amp':
            from guardx_tpu.envs import humanoid_amp as ha

            return ha.NUM_OBS
        if self.spec.kind == 'hover':
            # pos error (3), yaw sin/cos (2), qvel (nv)
            return 5 + self.model.nv
        if self.spec.kind == 'command':
            # locomotion obs + velocity commands (vx, vy, yaw rate)
            return (self.model.nq - 2) + self.model.nv + 3
        if self.spec.kind == 'balance':
            # tilt pos/vel (4), ball rel pos (3), ball lin vel (3)
            return 10
        if self.spec.kind == 'cabinet':
            # arm qpos/qvel (12), handle-ee delta (3), opening pos/vel (2)
            return 17
        if self.spec.kind == 'trifinger':
            # finger qpos/qvel (18), cube pose (7), cube linvel (3),
            # target delta (3)
            return 31
        if self.spec.kind == 'inhand':
            # finger qpos/qvel (24), cube quat (4), cube angvel (3),
            # cube pos (3), target yaw sin/cos (2)
            return 36
        if self.spec.kind == 'inhand_quat':
            # finger qpos/qvel (30), cube quat (4), cube angvel (3),
            # cube pos (3), target quat (4)
            return 44
        if self.spec.kind == 'cube_stack':
            # arm+gripper q/qd (9+9), cubeA pose (7) + linvel (3),
            # cubeA -> stack-target (3), ee -> cubeA (3), pads -> cubeA (6)
            return 9 + 9 + 7 + 3 + 3 + 3 + 6
        if self.spec.kind == 'kuka':
            # per-arm qpos/qvel (2 x 15 dofs each), cube pose (7), cube
            # linvel (3), target-cube delta (3), fingertip-to-cube vectors
            # (3 per tip), lifted flag (1) — mirrors the reference's
            # full-state obs (allegro_kuka_base.py:196-215 and the
            # two-arms variant's num_arms-scaled blocks,
            # allegro_kuka_two_arms.py:176-195)
            n_dof = 15 * self._n_arms
            return 2 * n_dof + 7 + 3 + 3 + 3 * len(self._tips) + 1
        # locomotion: qpos minus root xy, full qvel
        return (self.model.nq - 2) + self.model.nv

    def _humanoid_amp_obs(self, data):
        """105-dim AMP/humanoid observation from simulation state
        (envs/humanoid_amp.py build_amp_obs). Free-joint angular velocity
        is body-frame in qvel; the obs builder wants world frame."""
        from guardx_tpu.envs import humanoid_amp as ha
        from guardx_tpu.physics import maths

        root_quat = data.qpos[3:7]
        ang_world = maths.quat_rotate(root_quat, data.qvel[3:6])
        return ha.build_amp_obs(
            data.qpos[0:3], root_quat, data.qvel[0:3], ang_world,
            data.qpos[7:], data.qvel[6:], data.xpos[self._key_body_ids],
        )

    def _observe(self, state: BenchState):
        qpos, qvel = state.data.qpos, state.data.qvel
        if self.spec.kind == 'humanoid_amp':
            return self._humanoid_amp_obs(state.data)
        if self.spec.kind == 'cartpole':
            return jnp.stack([qpos[0], qvel[0], qpos[1], qvel[1]])
        if self.spec.kind == 'hover':
            pos = jnp.stack([qpos[0], qpos[1], qpos[2]])
            yaw = qpos[3]
            return jnp.concatenate([
                state.target[:3] - pos, jnp.stack([jnp.sin(yaw), jnp.cos(yaw)]),
                qvel,
            ])
        if self.spec.kind == 'command':
            return jnp.concatenate([qpos[2:], qvel, state.target[:3]])
        if self.spec.kind == 'balance':
            a = self._ball_adr
            ball = jax.lax.dynamic_slice(qpos, (a,), (3,))
            tray_c = state.data.xpos[self.body_robot]
            return jnp.concatenate([
                qpos[:2], qvel[:2],
                ball - tray_c - jnp.array([0.0, 0.0, 0.08]),
                jax.lax.dynamic_slice(qvel, (2,), (3,)),
            ])
        if self.spec.kind == 'cabinet':
            ee = self._geom_world(state.data, self._ee)
            handle = self._geom_world(state.data, self._handle)
            d = self._drawer_adr
            return jnp.concatenate([
                qpos[:6], qvel[:6], handle - ee,
                qpos[d:d + 1], qvel[d:d + 1],
            ])
        if self.spec.kind == 'trifinger':
            a = self._cube_adr
            cube_pose = jax.lax.dynamic_slice(qpos, (a,), (7,))
            cube_vel = jax.lax.dynamic_slice(qvel, (a,), (3,))
            return jnp.concatenate([
                qpos[:9], qvel[:9], cube_pose, cube_vel,
                state.target[:3] - cube_pose[:3],
            ])
        if self.spec.kind == 'inhand':
            a = self._cube_adr
            cube_pos = jax.lax.dynamic_slice(qpos, (a,), (3,))
            cube_quat = jax.lax.dynamic_slice(qpos, (a + 3,), (4,))
            # angular velocity dofs follow the 3 linear ones
            cube_w = jax.lax.dynamic_slice(qvel, (a + 3,), (3,))
            ty = state.target[0]
            return jnp.concatenate([
                qpos[:12], qvel[:12], cube_quat, cube_w, cube_pos,
                jnp.stack([jnp.sin(ty), jnp.cos(ty)]),
            ])
        if self.spec.kind == 'inhand_quat':
            a = self._cube_adr
            cube_pos = jax.lax.dynamic_slice(qpos, (a,), (3,))
            cube_quat = jax.lax.dynamic_slice(qpos, (a + 3,), (4,))
            cube_w = jax.lax.dynamic_slice(qvel, (a + 3,), (3,))
            return jnp.concatenate([
                qpos[:15], qvel[:15], cube_quat, cube_w, cube_pos,
                state.target,
            ])
        if self.spec.kind == 'cube_stack':
            a, b = self._cubeA_adr, self._cubeB_adr
            cubeA = jax.lax.dynamic_slice(qpos, (a,), (7,))
            cubeA_v = jax.lax.dynamic_slice(qvel, (a,), (3,))
            cubeB_p = jax.lax.dynamic_slice(qpos, (b,), (3,))
            target = cubeB_p + jnp.array([0.0, 0.0, self._szA + self._szB])
            ee = self._geom_world(state.data, self._ee)
            pl = self._geom_world(state.data, self._pad_l)
            pr = self._geom_world(state.data, self._pad_r)
            return jnp.concatenate([
                qpos[:9], qvel[:9], cubeA, cubeA_v,
                target - cubeA[:3], cubeA[:3] - ee,
                cubeA[:3] - pl, cubeA[:3] - pr,
            ])
        if self.spec.kind == 'kuka':
            a = self._cube_adr
            n_dof = 15 * self._n_arms
            cube_pos = jax.lax.dynamic_slice(qpos, (a,), (3,))
            cube_quat = jax.lax.dynamic_slice(qpos, (a + 3,), (4,))
            cube_v = jax.lax.dynamic_slice(qvel, (a,), (3,))
            tips = jnp.stack([
                self._geom_world(state.data, t) for t in self._tips
            ])  # (n_tips, 3)
            return jnp.concatenate([
                qpos[:n_dof], qvel[:n_dof], cube_pos, cube_quat, cube_v,
                state.target[:3] - cube_pos,
                (tips - cube_pos).reshape(-1),
                state.aux[len(self._tips):len(self._tips) + 1],  # lifted
            ])
        return jnp.concatenate([qpos[2:], qvel])

    # -- reward/done -------------------------------------------------------

    def _reward_done(self, state: BenchState, action):
        qpos, qvel = state.data.qpos, state.data.qvel
        spec = self.spec
        if spec.kind == 'humanoid_amp':
            # constant task reward (humanoid_amp_base.py
            # compute_humanoid_reward: ones) — style comes from the AMP
            # discriminator; early termination when the root falls below
            # terminationHeight, skipping the first step after a reset
            # (compute_humanoid_reset progress_buf > 1 guard)
            from guardx_tpu.envs import humanoid_amp as ha

            reward = jnp.float32(1.0)
            fell = jnp.logical_and(
                qpos[2] < ha.TERMINATION_HEIGHT, state.steps > 1
            )
            return reward, fell.astype(jnp.float32)
        if spec.kind == 'cartpole':
            # IsaacGymEnvs cartpole.py compute_cartpole_reward semantics:
            # upright bonus minus velocity penalties; hard reset (reward -2)
            # when the cart leaves the rail or the pole passes horizontal
            x, th = qpos[0], qpos[1]
            reward = (1.0 - th * th - 0.01 * jnp.abs(qvel[0])
                      - 0.005 * jnp.abs(qvel[1]))
            fell = jnp.logical_or(
                jnp.abs(x) > CARTPOLE_RESET_DIST, jnp.abs(th) > jnp.pi / 2
            )
            reward = jnp.where(fell, -2.0, reward)
            return reward, fell.astype(jnp.float32)
        if spec.kind == 'hover':
            pos = jnp.stack([qpos[0], qpos[1], qpos[2]])
            dist2 = jnp.sum((state.target[:3] - pos) ** 2)
            pos_reward = 1.0 / (1.0 + dist2)
            spin = qvel[3]
            spin_reward = 0.1 / (1.0 + spin * spin)
            reward = pos_reward * (1.0 + spin_reward)
            done = (dist2 > 64.0).astype(jnp.float32)
            return reward, done
        if spec.kind == 'command':
            # anymal_terrain.py command tracking: exp-shaped linear/angular
            # velocity tracking minus an action-energy penalty
            cmd = state.target[:3]
            lin_err = (qvel[0] - cmd[0]) ** 2 + (qvel[1] - cmd[1]) ** 2
            ang_err = (qvel[5] - cmd[2]) ** 2
            reward = (
                jnp.exp(-4.0 * lin_err)
                + 0.5 * jnp.exp(-4.0 * ang_err)
                - spec.energy_cost * jnp.sum(action ** 2)
            )
            z = qpos[2]
            fell = jnp.logical_or(z < spec.z_lo, z > spec.z_hi)
            return reward, fell.astype(jnp.float32)
        if spec.kind == 'balance':
            a = self._ball_adr
            ball = jax.lax.dynamic_slice(qpos, (a,), (3,))
            tray_c = state.data.xpos[self.body_robot]
            d2 = jnp.sum((ball[:2] - tray_c[:2]) ** 2)
            reward = 1.0 / (1.0 + 15.0 * d2)
            fell = ball[2] < 0.3  # ball dropped off the tray
            reward = jnp.where(fell, -2.0, reward)
            return reward, fell.astype(jnp.float32)
        if spec.kind == 'trifinger':
            a = self._cube_adr
            cube = jax.lax.dynamic_slice(qpos, (a,), (3,))
            tips = jnp.stack([
                self._geom_world(state.data, t) for t in self._tips
            ])
            d_reach = jnp.min(jnp.linalg.norm(tips - cube, axis=-1))
            d_goal2 = jnp.sum((state.target[:3] - cube) ** 2)
            success = d_goal2 < 0.04 ** 2
            reward = (0.3 / (1.0 + 30.0 * d_reach ** 2)
                      + 1.0 / (1.0 + 20.0 * d_goal2)
                      + jnp.where(success, 5.0, 0.0)
                      - 0.003 * jnp.sum(action ** 2))
            out_of_arena = jnp.linalg.norm(cube[:2]) > 0.5
            done = jnp.logical_or(success, out_of_arena)
            return reward, done.astype(jnp.float32)
        if spec.kind == 'inhand_quat':
            a = self._cube_adr
            q = jax.lax.dynamic_slice(qpos, (a + 3,), (4,))
            q = q / jnp.maximum(jnp.linalg.norm(q), 1e-6)
            # geodesic rotation distance to the target quaternion
            dot = jnp.abs(jnp.sum(q * state.target))
            rot_dist = 2.0 * jnp.arccos(jnp.clip(dot, -1.0, 1.0))
            success = rot_dist < 0.1
            cube_z = qpos[a + 2]
            dropped = cube_z < 0.32
            # shadow_hand.py rot reward shape: 1/(|d| + eps) scaled
            reward = (0.2 / (jnp.abs(rot_dist) + 0.1)
                      + jnp.where(success, 5.0, 0.0)
                      - 0.003 * jnp.sum(action ** 2))
            reward = jnp.where(dropped, -5.0, reward)
            done = jnp.logical_or(success, dropped)
            return reward, done.astype(jnp.float32)
        if spec.kind == 'inhand':
            a = self._cube_adr
            q = jax.lax.dynamic_slice(qpos, (a + 3,), (4,))
            w_, x_, y_, z_ = q[0], q[1], q[2], q[3]
            yaw = jnp.arctan2(2 * (w_ * z_ + x_ * y_),
                              1 - 2 * (y_ * y_ + z_ * z_))
            err = yaw - state.target[0]
            err = jnp.arctan2(jnp.sin(err), jnp.cos(err))  # wrap to [-pi,pi]
            success = jnp.abs(err) < 0.1
            cube_z = qpos[a + 2]
            dropped = cube_z < 0.32
            reward = (1.0 / (1.0 + 4.0 * err * err)
                      + jnp.where(success, 5.0, 0.0)
                      - 0.003 * jnp.sum(action ** 2))
            reward = jnp.where(dropped, -5.0, reward)
            done = jnp.logical_or(success, dropped)
            return reward, done.astype(jnp.float32)
        if spec.kind == 'cube_stack':
            # compute_franka_reward (franka_cube_stack.py:698-747) with
            # the ground plane as the table (table_height = 0)
            a, b = self._cubeA_adr, self._cubeB_adr
            cubeA = jax.lax.dynamic_slice(qpos, (a,), (3,))
            cubeB = jax.lax.dynamic_slice(qpos, (b,), (3,))
            ee = self._geom_world(state.data, self._ee)
            pl = self._geom_world(state.data, self._pad_l)
            pr = self._geom_world(state.data, self._pad_r)
            d = jnp.linalg.norm(cubeA - ee)
            d_lf = jnp.linalg.norm(cubeA - pl)
            d_rf = jnp.linalg.norm(cubeA - pr)
            dist_reward = 1.0 - jnp.tanh(10.0 * (d + d_lf + d_rf) / 3.0)
            # lifted: center clears rest height by > 0.04 (reference:
            # cubeA_height - cubeA_size > 0.04 with full size 0.05)
            lifted = (cubeA[2] - 2 * self._szA > 0.04).astype(jnp.float32)
            offset = jnp.array([0.0, 0.0, self._szA + self._szB])
            d_ab = jnp.linalg.norm(cubeB + offset - cubeA)
            align = (1.0 - jnp.tanh(10.0 * d_ab)) * lifted
            dist_reward = jnp.maximum(dist_reward, align)
            target_h = 2 * self._szB + self._szA
            stack = jnp.logical_and(
                jnp.linalg.norm(cubeA[:2] - cubeB[:2]) < 0.02,
                jnp.logical_and(jnp.abs(cubeA[2] - target_h) < 0.02,
                                d > 0.04),
            ).astype(jnp.float32)
            reward = jnp.where(
                stack > 0.0, 16.0 * stack,
                0.1 * dist_reward + 1.5 * lifted + 2.0 * align,
            )
            out = jnp.logical_or(
                jnp.linalg.norm(cubeA[:2]) > 1.2, cubeA[2] < -0.05
            ).astype(jnp.float32)
            done = jnp.maximum(stack, out)
            return reward, done
        if spec.kind == 'cabinet':
            ee = self._geom_world(state.data, self._ee)
            handle = self._geom_world(state.data, self._handle)
            d2 = jnp.sum((handle - ee) ** 2)
            opening = qpos[self._drawer_adr]
            reward = (0.5 / (1.0 + 10.0 * d2) + 4.0 * opening
                      - 0.005 * jnp.sum(action ** 2))
            done = (opening > 0.3).astype(jnp.float32)
            return reward, done
        # locomotion: forward progress + alive - energy (IsaacGym ant.py /
        # humanoid.py potentials shape, flat-ground special case)
        vx = qvel[0]
        reward = (spec.forward_scale * vx + spec.alive_bonus
                  - spec.energy_cost * jnp.sum(action ** 2))
        z = qpos[2]
        fell = jnp.logical_or(z < spec.z_lo, z > spec.z_hi)
        return reward, fell.astype(jnp.float32)

    # -- AllegroKuka regrasping reward ---------------------------------------

    # reference scales: cfg/task/AllegroKuka.yaml:43-50,83-88
    KUKA_DIST_DELTA_SCALE = 50.0
    KUKA_LIFTING_SCALE = 20.0
    KUKA_LIFTING_BONUS = 300.0
    KUKA_LIFT_THRESHOLD = 0.15
    KUKA_KEYPOINT_SCALE = 200.0
    KUKA_REACH_BONUS = 1000.0
    KUKA_SUCCESS_TOL = 0.075
    KUKA_ARM_PENALTY = 0.003
    KUKA_HAND_PENALTY = 0.0003

    def _kuka_volume(self):
        tv = self.spec.target_volume
        if tv is None:
            tv = ([0.35, -0.25, 0.2], [0.8, 0.25, 0.5])
        return jnp.asarray(tv[0], jnp.float32), jnp.asarray(tv[1], jnp.float32)

    def _kuka_reward(self, mid: BenchState, action):
        """Regrasping reward (allegro_kuka_base.py:759-905 structure):

        - closest-ever fingertip-to-object delta reward, pre-lift only
        - per-step lifting shaping clip(z_lift, 0, 0.5), pre-lift only,
          plus a one-time bonus when z_lift crosses the threshold
        - closest-ever object-to-target (keypoint) delta reward, post-lift
        - |dof velocity| action penalties (arm and hand scales)
        - success when object is within tolerance of the target
          (successSteps=1): reach bonus, then the target respawns and the
          object is reset to the surface (_reset_target semantics)
        """
        data = mid.data
        aux = mid.aux
        a = self._cube_adr
        cube = jax.lax.dynamic_slice(data.qpos, (a,), (3,))
        tips = jnp.stack([
            self._geom_world(data, t) for t in self._tips
        ])  # (4, 3)
        cur_d = jnp.linalg.norm(tips - cube, axis=-1)  # (n_tips,)

        n = len(self._tips)
        cf, lifted = aux[0:n], aux[n]
        closest_kp, successes, init_z = aux[n + 1], aux[n + 3], aux[n + 4]
        # resolve the -1 first-use sentinels to the current distances
        # (allegro_kuka_base.py:1044,1078): first step earns zero delta
        cf = jnp.where(cf < 0.0, cur_d, cf)

        not_lifted = 1.0 - lifted
        ftip_delta = jnp.sum(jnp.clip(cf - cur_d, 0.0, 10.0)) * not_lifted
        cf_new = jnp.minimum(cf, cur_d)

        z_lift = 0.05 + cube[2] - init_z
        lifting = jnp.clip(z_lift, 0.0, 0.5) * not_lifted
        lifted_new = jnp.maximum(lifted, (z_lift > self.KUKA_LIFT_THRESHOLD)
                                 .astype(jnp.float32))
        just_lifted = lifted_new * not_lifted

        kp_dist = jnp.linalg.norm(cube - mid.target[:3])
        closest_kp = jnp.where(closest_kp < 0.0, kp_dist, closest_kp)
        kp_delta = jnp.clip(closest_kp - kp_dist, 0.0, 100.0) * lifted_new
        closest_kp_new = jnp.minimum(closest_kp, kp_dist)

        arm_dofs = jnp.concatenate([
            data.qvel[15 * k:15 * k + 7] for k in range(self._n_arms)
        ])
        hand_dofs = jnp.concatenate([
            data.qvel[15 * k + 7:15 * (k + 1)] for k in range(self._n_arms)
        ])
        arm_pen = self.KUKA_ARM_PENALTY * jnp.sum(jnp.abs(arm_dofs))
        hand_pen = self.KUKA_HAND_PENALTY * jnp.sum(jnp.abs(hand_dofs))

        near_goal = (kp_dist <= self.KUKA_SUCCESS_TOL).astype(jnp.float32)
        success = near_goal  # successSteps = 1 (AllegroKuka.yaml:88)

        reward = (
            self.KUKA_DIST_DELTA_SCALE * ftip_delta
            + self.KUKA_LIFTING_SCALE * lifting
            + self.KUKA_LIFTING_BONUS * just_lifted
            + self.KUKA_KEYPOINT_SCALE * kp_delta
            + self.KUKA_REACH_BONUS * success
            - arm_pen - hand_pen
        )

        # success: respawn the target and put the object back on the
        # surface with fresh trackers (the reference's _reset_target)
        rng, k_t, k_c = jax.random.split(mid.rng, 3)
        tv_lo, tv_hi = self._kuka_volume()
        new_target = jnp.concatenate([
            jax.random.uniform(k_t, (3,), minval=tv_lo, maxval=tv_hi),
            jnp.zeros(1),
        ])
        cube_xy = self._kuka_qinit[a:a + 2] + jax.random.uniform(
            k_c, (2,), minval=-0.08, maxval=0.08
        )
        cube_reset = jnp.concatenate([
            cube_xy, self._kuka_qinit[a + 2:a + 3],
            jnp.array([1.0, 0.0, 0.0, 0.0]),
        ])
        qpos_s = jax.lax.dynamic_update_slice(data.qpos, cube_reset, (a,))
        qvel_s = jax.lax.dynamic_update_slice(
            data.qvel, jnp.zeros(6, jnp.float32), (a,)
        )
        w = success > 0.5
        data = data.replace(
            qpos=jnp.where(w, qpos_s, data.qpos),
            qvel=jnp.where(w, qvel_s, data.qvel),
        )
        target = jnp.where(w, new_target, mid.target)
        init_z_slot = aux[n + 4:n + 5]
        aux_cont = jnp.concatenate([
            cf_new, lifted_new[None], closest_kp_new[None],
            near_goal[None], (successes + success)[None], init_z_slot,
        ])
        aux_succ = jnp.concatenate([
            jnp.full((n,), -1.0), jnp.zeros(1), jnp.full((1,), -1.0),
            jnp.zeros(1), (successes + success)[None], init_z_slot,
        ])
        aux = jnp.where(w, aux_succ, aux_cont)

        # episode reset when the object leaves the workspace or is pushed
        # through the work surface (_compute_resets object-fall analogue,
        # allegro_kuka_base.py:845; timeout is generic)
        done = jnp.logical_or(
            jnp.linalg.norm(cube[:2]) > 1.2, cube[2] < -0.1
        ).astype(jnp.float32)
        return mid.replace(data=data, target=target, aux=aux, rng=rng), \
            reward, done

    # -- functional single-env API ------------------------------------------

    def _fresh(self, rng):
        if self.spec.kind == 'humanoid_amp':
            # reference-state initialization: a uniform random frame of a
            # random mocap clip (HumanoidAMP.yaml stateInit: "Random";
            # humanoid_amp.py _reset_ref_state_init)
            rng, k_f = jax.random.split(rng)
            idx = jax.random.randint(
                k_f, (), 0, self._motion_qpos.shape[0]
            )
            data = physics.make_data(self.model)
            data = data.replace(
                qpos=self._motion_qpos[idx], qvel=self._motion_qvel[idx],
                ctrl=jnp.zeros(self.model.nu, jnp.float32),
            )
            data = physics.forward(self.model, data)
            return BenchState(
                data=data, target=jnp.zeros(4, jnp.float32),
                steps=jnp.int32(0), rng=rng,
                aux=jnp.zeros(9, jnp.float32),
                dr=randomize.init_dr(False),
            )
        rng, k_q, k_v, k_t = jax.random.split(rng, 4)
        noise = self.spec.reset_noise
        qpos = self._qpos0 + noise * jax.random.uniform(
            k_q, (self.model.nq,), minval=-1.0, maxval=1.0
        )
        # free joints: xy noise only, reference height, exactly upright
        from guardx_tpu.physics.model import FREE

        for j, t in enumerate(self.model.jnt_type_t):
            if t != FREE:
                continue
            adr = self.model.jnt_qposadr_t[j]
            if not self._free or adr != self.meta['jnt_name2qposadr'].get(
                'robot', -1
            ):
                # non-robot free body (e.g. the BallBalance ball): keep the
                # xy noise already applied
                pass
            else:
                qpos = qpos.at[adr:adr + 2].set(0.0)
            qpos = qpos.at[adr + 2].set(self._qpos0[adr + 2])
            quat0 = jnp.zeros(4, jnp.float32).at[0].set(1.0)
            qpos = jax.lax.dynamic_update_slice(qpos, quat0, (adr + 3,))
        qvel = 0.1 * noise * jax.random.uniform(
            k_v, (self.model.nv,), minval=-1.0, maxval=1.0
        )
        pad1 = lambda t: jnp.concatenate([t, jnp.zeros(1, jnp.float32)])
        if self.spec.kind == 'cube_stack':
            # ready pose + joint noise; cubes settle on the surface with
            # xy scatter (franka_cube_stack.py _reset_init_cube_state)
            k_a, k_b = jax.random.split(k_t)
            qpos = self._stack_qinit + noise * jax.random.uniform(
                k_q, (self.model.nq,), minval=-1.0, maxval=1.0
            )
            # fingers start fully OPEN (reset noise on a 4 cm-travel slide
            # would otherwise start them closed)
            for jname in ('finger_l', 'finger_r'):
                adr_f = self.meta['jnt_name2qposadr'][jname]
                qpos = qpos.at[adr_f].set(0.0)
            for adr, key, sz in ((self._cubeA_adr, k_a, self._szA),
                                 (self._cubeB_adr, k_b, self._szB)):
                xy = self._stack_qinit[adr:adr + 2] + jax.random.uniform(
                    key, (2,), minval=-0.05, maxval=0.05
                )
                cube0 = jnp.concatenate([
                    xy, jnp.array([sz]), jnp.array([1.0, 0.0, 0.0, 0.0]),
                ])
                qpos = jax.lax.dynamic_update_slice(qpos, cube0, (adr,))
            qvel = jnp.zeros(self.model.nv, jnp.float32)
        if self.spec.kind == 'kuka':
            # arm at the ready pose + joint noise; cube on the surface with
            # xy scatter (reset_object_pose, allegro_kuka_base.py)
            k_c, k_t2 = jax.random.split(k_t)
            qpos = self._kuka_qinit + noise * jax.random.uniform(
                k_q, (self.model.nq,), minval=-1.0, maxval=1.0
            )
            a = self._cube_adr
            cube_xy = self._kuka_qinit[a:a + 2] + jax.random.uniform(
                k_c, (2,), minval=-0.08, maxval=0.08
            )
            cube0 = jnp.concatenate([
                cube_xy, self._kuka_qinit[a + 2:a + 3],
                jnp.array([1.0, 0.0, 0.0, 0.0]),
            ])
            qpos = jax.lax.dynamic_update_slice(qpos, cube0, (a,))
            k_t = k_t2
        if self.spec.kind == 'hover':
            target = pad1(jax.random.uniform(
                k_t, (3,), minval=jnp.array([-2.0, -2.0, 1.0]),
                maxval=jnp.array([2.0, 2.0, 2.5]),
            ))
        elif self.spec.kind == 'inhand':
            # target yaw for the in-hand reorientation
            ty = jax.random.uniform(k_t, (), minval=-jnp.pi / 2,
                                    maxval=jnp.pi / 2)
            target = jnp.stack([ty, 0.0, 0.0, 0.0])
        elif self.spec.kind == 'trifinger':
            # cube target on the table within reach of the fingers
            target = pad1(jax.random.uniform(
                k_t, (3,), minval=jnp.array([-0.12, -0.12, 0.033]),
                maxval=jnp.array([0.12, 0.12, 0.034]),
            ))
        elif self.spec.kind == 'command':
            # velocity commands: vx, vy, yaw rate (anymal_terrain ranges)
            target = pad1(jax.random.uniform(
                k_t, (3,), minval=jnp.array([-1.0, -0.5, -1.0]),
                maxval=jnp.array([1.0, 0.5, 1.0]),
            ))
        elif self.spec.kind == 'kuka':
            # in-air target volume over the workspace (the reference's
            # target_volume_origin/extent, allegro_kuka_base.py:251-252 /
            # allegro_kuka_two_arms.py:242-243, shifted to this rig)
            tv_lo, tv_hi = self._kuka_volume()
            target = pad1(jax.random.uniform(
                k_t, (3,), minval=tv_lo, maxval=tv_hi,
            ))
        elif self.spec.kind == 'inhand_quat':
            # random target orientation: uniform axis, bounded angle
            # (shadow_hand.py reorientation goal)
            k_ax, k_an = jax.random.split(k_t)
            axis = jax.random.normal(k_ax, (3,))
            axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-6)
            ang = jax.random.uniform(k_an, (), minval=-jnp.pi, maxval=jnp.pi)
            target = jnp.concatenate([
                jnp.cos(ang / 2)[None], jnp.sin(ang / 2) * axis
            ])
        else:
            target = jnp.zeros(4, jnp.float32)
        if self.spec.kind == 'cabinet':
            # drawer starts closed (franka_cabinet reset)
            qpos = qpos.at[self._drawer_adr].set(0.0)
        if self.spec.kind == 'balance':
            # ball starts at a random spot on the tray
            a = self._ball_adr
            ball_xy = self._qpos0[a:a + 2] + jax.random.uniform(
                k_t, (2,), minval=-0.15, maxval=0.15
            )
            qpos = jax.lax.dynamic_update_slice(qpos, ball_xy, (a,))
        data = physics.make_data(self.model)
        data = data.replace(
            qpos=qpos, qvel=qvel,
            ctrl=jnp.zeros(self.model.nu, jnp.float32),
        )
        dr = randomize.init_dr(self.dr_enabled)
        if self.dr_enabled:
            rng, k_dr = jax.random.split(rng)
            dr = randomize.sample_mult(k_dr, dr)
        data = physics.forward(self.model, data)
        if self.spec.kind == 'kuka':
            # [cf0..cf(n-1) closest fingertip dists, lifted, closest kp
            #  dist, near-goal steps, successes, object spawn z]; -1
            # sentinels resolve to the current distance on first use, so
            # the first step earns zero delta reward
            # (allegro_kuka_base.py:346,1044)
            a = self._cube_adr
            n = len(self._tips)
            aux = jnp.concatenate([
                jnp.full((n,), -1.0), jnp.zeros(1), jnp.full((1,), -1.0),
                jnp.zeros(2), qpos[a + 2:a + 3],
            ])
        else:
            aux = jnp.zeros(9, jnp.float32)
        return BenchState(
            data=data, target=target, steps=jnp.int32(0), rng=rng, aux=aux,
            dr=dr,
        )

    def reset_single(self, rng, pool: LayoutPool):
        state = self._fresh(rng)
        return self._observe(state), state

    def step_single(self, state: BenchState, action):
        model = self.model
        if self.dr_enabled:
            # randomized physics + action noise (vec_task.py:610 semantics;
            # multipliers are this env's current DR draw)
            rng, k_act = jax.random.split(state.rng)
            state = state.replace(rng=rng)
            mult = state.dr['mult']
            model = randomize.apply_to_model(model, mult)
            action = action + mult[6] * jax.random.normal(
                k_act, jnp.shape(action)
            )
        if self.spec.kind == 'humanoid_amp':
            # PD position control (humanoid_amp_base.py _build_pd_action
            # _offset_scale + pre_physics_step): action -> dof target,
            # torque kp (target - q) - kd qd recomputed each physics
            # substep, effort-limited by the motor gear (ctrlrange +-1)
            target = self._pd_offset + self._pd_scale * action

            def pd_substep(data, _):
                tau = (self._pd_kp * (target - data.qpos[7:])
                       - self._pd_kd * data.qvel[6:])
                data = physics.step(
                    model, data.replace(ctrl=tau / self._amp_gear)
                )
                return data, None

            data, _ = jax.lax.scan(
                pd_substep, state.data, (), length=self.control_substeps
            )
        else:
            data = state.data.replace(ctrl=action)
            data = physics.step(model, data)
        mid = state.replace(data=data)

        if self.spec.kind == 'kuka':
            mid, reward, done = self._kuka_reward(mid, action)
            obs = self._observe(mid)
        else:
            obs = self._observe(mid)
            reward, done = self._reward_done(mid, action)

        if self.dr_enabled:
            rng, k_obs = jax.random.split(mid.rng)
            mid = mid.replace(rng=rng)
            obs = obs + mid.dr['mult'][5] * jax.random.normal(
                k_obs, obs.shape
            )
        bad = jnp.logical_or(jnp.isnan(obs).any(), jnp.isinf(obs).any())
        reward = jnp.where(bad, 0.0, reward)
        done = jnp.where(bad, 1.0, done)

        # a max_ep_len cut is a TRUNCATION, not a terminal state: report it
        # distinctly so the trainer can value-bootstrap it (rl_games
        # a2c_common.py value_bootstrap / IsaacGym's timeout_buf); a
        # simultaneous natural done stays a termination
        timeout = jnp.where(
            (mid.steps > self.num_steps) & (done < 0.5), 1.0, 0.0
        )
        done = jnp.where(mid.steps > self.num_steps, 1.0, done)
        steps = jnp.where(done > 0.0, 0, mid.steps + 1)
        rng, _ = jax.random.split(mid.rng)
        new_state = mid.replace(steps=steps, rng=rng)
        info = {'cost': jnp.float32(0.0),  # zero-cost pad (wrapper parity)
                'timeout': timeout}
        return obs, reward, done, info, new_state

    def reset_done_single(self, state: BenchState, done, flat_obs,
                          pool: LayoutPool):
        rng, sub = jax.random.split(state.rng)
        fresh = self._fresh(sub)
        w = done > 0.0
        merged = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(w, (1,) * a.ndim) if a.ndim else w, a, b
            ),
            fresh, state.replace(rng=rng),
        )
        if self.dr_enabled:
            # the env KEEPS its assigned DR ranges across in-episode
            # resets (ADR pins them per epoch) and draws fresh
            # multipliers from them at each reset
            rng2, k_dr = jax.random.split(merged.rng)
            resampled = randomize.sample_mult(k_dr, state.dr)
            dr = {
                'lo': state.dr['lo'], 'hi': state.dr['hi'],
                'mult': jnp.where(w, resampled['mult'], state.dr['mult']),
            }
            merged = merged.replace(dr=dr, rng=rng2)
        obs = jnp.where(w, self._observe(fresh), flat_obs)
        return obs, merged

    # -- AMP demo interface -------------------------------------------------

    def demo_amp_pairs(self):
        """(N, 2, 105) consecutive AMP-observation pairs from the loaded
        mocap clips, one control step apart (reference fetch_amp_obs_demo;
        numAMPObsSteps = 2) — feed directly to algos/algorithms/amp.AMP
        as `demos` (the policy observation IS the AMP feature vector)."""
        if self.spec.kind != 'humanoid_amp':
            raise ValueError("demo_amp_pairs: HumanoidAMP only")
        return self.motion_lib.demo_pairs(
            self.control_dt, self._motion_amp_obs
        )

    # -- stateful batched API (gym-flavored, parity with Engine) ------------

    def reset(self):
        self._key, k_env = jax.random.split(self._key)
        pool = self._make_pool(self._key)
        keys = jax.random.split(k_env, self.env_num)
        self._pool = pool
        self._obs, self._state = self._reset(keys, pool)
        return self._obs

    def step(self, action):
        obs, rew, done, info, self._state = self._step(
            self._state, jnp.asarray(action)
        )
        self._obs, self._done = obs, done
        return obs, rew, done, info

    def reset_done(self):
        self._obs, self._state = self._reset_done(
            self._state, self._done, self._obs, self._pool
        )
        return self._obs

    # -- rendering (video.py replay path) ----------------------------------

    def render(self, env_idx: int = 0, width: int = 640, height: int = 480):
        """Software side-view painter: body positions as discs sized by
        geom extent, plus the task target. Bench tasks have no GUARD
        overlay vocabulary; this keeps video.py's replay path working
        headless for every native task."""
        import matplotlib

        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        d0 = jax.tree_util.tree_map(
            lambda x: x[env_idx], self._state.data
        )
        xpos = np.asarray(d0.xpos)
        sizes = np.asarray(self.model.geom_size)
        gbody = np.asarray(self.model.geom_bodyid)

        fig = plt.figure(figsize=(width / 100, height / 100), dpi=100)
        ax = fig.add_axes([0, 0, 1, 1])
        ext = max(1.0, float(np.abs(xpos[:, [0, 2]]).max()) * 1.3)
        ax.set_xlim(-ext, ext)
        ax.set_ylim(-0.1, max(1.0, ext))
        ax.set_aspect('equal')
        ax.set_facecolor('#f2f2f2')
        ax.axhline(0.0, color='#888888', lw=1.5)  # ground line
        for g in range(len(gbody)):
            b = int(gbody[g])
            if b == 0:
                continue
            r = float(max(np.max(sizes[g]), 0.02))
            ax.add_patch(plt.Circle(
                (xpos[b, 0], xpos[b, 2]), r, color='#cc4444', alpha=0.6
            ))
        tgt = np.asarray(self._state.target[env_idx])
        if np.any(tgt != 0):
            ax.add_patch(plt.Circle(
                (tgt[0], tgt[2] if tgt.shape[0] > 2 else 0.1), 0.05,
                color='#33aa33', alpha=0.9,
            ))
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy()
        plt.close(fig)
        return buf


NATIVE_BENCH_TASKS = sorted(TASKS)
