"""Task registry + env factory.

Behavioral rebuild of the reference's task-configuration layer
(reference: safe_rl_libX/guard_utils/safe_rl_env_config.py:6-2644):

- ``configuration_list(task)`` — the named registry: Goal/Push/Chase/Defense
  x {Point,Swimmer,Ant,Walker,Humanoid,Hopper,Doggo,Arm3,Arm6,Drone} x
  {8Hazards,8Ghosts} plus the 16 IsaacGym task names. The reference writes
  all ~77 configs out literally; they are generated here from the same
  (task, robot, constraint) grid with identical key/value content.
- ``configuration(task)`` — compositional fallback parser
  ``<Task>_<Robot>_<N><Type>[_noconti]`` (reference lines 2567-2594).
- ``create_env(args)`` — the single factory dispatching GUARD Engine vs
  Isaac wrappers (reference lines 2597-2614).

Constructibility: the reference Engine only constructs Goal_*_8Hazards
(Ghost/Push/Chase/Defense keys are legacy-GUARD carryovers its strict
parse rejects — SURVEY.md §1 L4). This rebuild goes further: the gx task
families implement Ghost/Push/Chase/Defense natively (engine.py task
dispatch; tests/test_task_families.py), so every registry grid entry
constructs. Registry configs keep the reference's key/value content.
"""

from __future__ import annotations

ROBOTS = ['Point', 'Swimmer', 'Ant', 'Walker', 'Humanoid', 'Hopper',
          'Doggo', 'Arm3', 'Arm6', 'Drone']
TASKS = ['Goal', 'Push', 'Chase', 'Defense']

BASE_SENSORS = ['accelerometer', 'velocimeter', 'gyro', 'magnetometer']

# per-robot touch/link sensor lists (safe_rl_env_config.py per-robot configs)
ROBOT_SENSORS = {
    'Point': None,  # Point configs do not set sensors_obs (engine DEFAULT)
    'Swimmer': BASE_SENSORS + ['touch_point1', 'touch_point2',
                               'touch_point3', 'touch_point4'],
    'Ant': BASE_SENSORS + ['touch_ankle_1a', 'touch_ankle_2a',
                           'touch_ankle_3a', 'touch_ankle_4a',
                           'touch_ankle_1b', 'touch_ankle_2b',
                           'touch_ankle_3b', 'touch_ankle_4b'],
    'Walker': BASE_SENSORS + ['touch_p1a', 'touch_p1b', 'touch_p2a',
                              'touch_p2b', 'touch_p3a', 'touch_p3b',
                              'touch_p4a', 'touch_p4b'],
    'Humanoid': BASE_SENSORS + ['touch_right_foot', 'touch_left_foot'],
    'Hopper': BASE_SENSORS + ['touch_foot'],
    'Doggo': BASE_SENSORS + ['touch_ankle_1a', 'touch_ankle_2a',
                             'touch_ankle_3a', 'touch_ankle_4a',
                             'touch_ankle_1b', 'touch_ankle_2b',
                             'touch_ankle_3b', 'touch_ankle_4b'],
    'Arm3': [f'{s}_link_{i}' for i in range(1, 5)
             for s in BASE_SENSORS] + ['touch_end_effector'],
    'Arm6': [f'{s}_link_{i}' for i in range(1, 8)
             for s in BASE_SENSORS] + ['touch_end_effector'],
    'Drone': BASE_SENSORS + ['touch_p1a', 'touch_p1b', 'touch_p2a',
                             'touch_p2b', 'touch_p3a', 'touch_p3b',
                             'touch_p4a', 'touch_p4b'],
}

ISAAC_GYM_TASKS = [
    'AllegroHand', 'AllegroHandDextremeADR', 'AllegroKukaTwoArmsLSTM',
    'AllegroKukaLSTM', 'Ant', 'Anymal', 'AnymalTerrain', 'BallBalance',
    'Cartpole', 'FrankaCabinet', 'Humanoid', 'Quadcopter', 'ShadowHand',
    'ShadowHandOpenAI_FF', 'ShadowHandOpenAI_LSTM', 'Trifinger',
]

# vendored IsaacGymEnvs tasks beyond the 16 guardX registry names, exposed
# under their IsaacGymEnvs names (the reference consumes them through
# isaacgymenvs.make; HumanoidAMP is tasks/humanoid_amp.py — the canonical
# AMP environment whose mocap clips utils/poselib.py ingests)
VENDORED_ISAAC_TASKS = ['HumanoidAMP', 'FrankaCubeStack']


def _guard_config(task: str, robot: str, constraint: str) -> dict:
    """One registry entry, with the same keys/values as the reference's
    literal blocks (e.g. Goal_Point_8Hazards at safe_rl_env_config.py:60-82,
    Push/Chase/Defense and Ghost variants per their blocks)."""
    config = {
        'robot_base': f'xmls/{robot.lower()}.xml',
        'task': task.lower(),
        'goal_size': 0.5,
        'constrain_indicator': False,
        'lidar_num_bins': 16,
    }
    if task == 'Goal':
        config['observe_goal_comp'] = True
    elif task == 'Push':
        config['push_object'] = 'ball'
        config['observe_goal_comp'] = True
        config['observe_box_comp'] = True
    else:  # Chase / Defense
        config['observe_robbers'] = True
        config['robbers_num'] = 2
        config['robbers_size'] = 0.3

    if constraint == 'Hazards':
        config['observe_hazards'] = True
        config['constrain_hazards'] = True
        config['hazards_num'] = 8
        config['hazards_size'] = 0.3
    else:  # Ghosts
        config['observe_ghosts'] = True
        config['constrain_ghosts'] = True
        config['ghosts_num'] = 8
        config['ghosts_size'] = 0.3
        config['ghosts_travel'] = 2.5
        config['ghosts_safe_dist'] = 1.5
        # the Engine DEFAULT carries 8 hazards (reference engine.py:195);
        # ghost tasks replace hazards, they don't add to them — without
        # this override 17 keepout-constrained objects make every layout
        # infeasible (the reference registry omits it because its engine
        # never constructed ghost configs at all)
        config['hazards_num'] = 0

    sensors = ROBOT_SENSORS[robot]
    if sensors is not None:
        config['sensors_obs'] = list(sensors)
    return config


def _build_registry() -> dict:
    reg = {}
    for task in TASKS:
        for robot in ROBOTS:
            for constraint in ['Hazards', 'Ghosts']:
                # Doggo exists only as Goal_Doggo_8Hazards in the reference
                if robot == 'Doggo' and (task != 'Goal' or constraint != 'Hazards'):
                    continue
                reg[f'{task}_{robot}_8{constraint}'] = _guard_config(
                    task, robot, constraint
                )
    # sensorless point variant (safe_rl_env_config.py:20-55)
    nosensor = _guard_config('Goal', 'Point', 'Hazards')
    nosensor.update({
        'sensors_obs': [],
        'sensors_hinge_joints': False,
        'sensors_ball_joints': False,
        'sensors_angle_components': False,
        'observation_flatten': True,
        'observe_qpos': True,
        'observe_qvel': True,
        'observe_ctrl': True,
    })
    reg['Goal_Point_8Hazards_nosensor'] = nosensor
    # IsaacGym tasks (safe_rl_env_config.py:2455-2566): name + device config
    for name in ISAAC_GYM_TASKS + VENDORED_ISAAC_TASKS:
        reg[name] = {
            'IsaacGym': True,
            'task_name': name,
            'device': 'cuda:0',
            'headless': True,
        }
    return reg


_REGISTRY = _build_registry()


def configuration_list(task: str) -> dict:
    """Named-task lookup (reference configuration_list). Raises KeyError on
    unknown names, which ``configuration`` catches to try the parser."""
    if task not in _REGISTRY:
        raise KeyError(task)
    import copy

    return copy.deepcopy(_REGISTRY[task])


def configuration(task: str) -> dict:
    """Named lookup with compositional fallback
    ``<Task>_<Robot>_<N><Type>[_noconti]`` (reference lines 2567-2594):
    resolve the 8-object base config, then override the object count and
    set continue_goal."""
    try:
        return configuration_list(task)
    except KeyError:
        pass
    try:
        task_split = task.split('_')
        Task, Robot, constraints = task_split[0], task_split[1], task_split[2]
        cont = not (len(task_split) >= 4 and task_split[3] == 'noconti')
        n, type_ = 0, ''
        for i, ch in enumerate(constraints):
            if not ch.isdigit():
                n = int(constraints[:i])
                type_ = constraints[i:]
                break
        config = configuration(f'{Task}_{Robot}_8{type_}')
        config['continue_goal'] = cont
        config[type_.lower() + '_num'] = n
        return config
    except (IndexError, ValueError, RecursionError) as e:
        raise ValueError(
            f"unknown task '{task}': not in the registry and not parseable "
            f"as <Task>_<Robot>_<N><Type>[_noconti]"
        ) from e


def create_env(args):
    """The single env factory (reference create_env, lines 2597-2614).

    args needs: task, env_num, seed, max_ep_len (argparse Namespace or any
    object with those attributes)."""
    config = configuration(args.task)
    config['env_num'] = args.env_num
    config['_seed'] = args.seed
    config['num_steps'] = args.max_ep_len
    config['device_id'] = 0
    if getattr(args, 'pool_refresh', None):
        config['gx_pool_refresh_every'] = int(args.pool_refresh)
    if getattr(args, 'layout_pool', None):
        config['gx_layout_pool'] = int(args.layout_pool)
        # explicitly-sized pools keep the reference's refusal to run with
        # fewer valid layouts than envs (engine.py:444)
        config['gx_strict_pool'] = True
    if config.get('IsaacGym'):
        import os

        from guardx_tpu.envs.bench_tasks import NATIVE_BENCH_TASKS

        name = config['task_name']
        # TPU hosts have no PhysX: benchmark tasks with a native
        # implementation (envs/bench_tasks.py) run on the guardx_tpu physics
        # engine; GUARDX_ISAAC_BINARY=1 forces the external-binary adapter
        # (reference isaacgymenvs.make path, safe_rl_env_config.py:2616-2626)
        if name in NATIVE_BENCH_TASKS and not os.environ.get(
            'GUARDX_ISAAC_BINARY'
        ):
            from guardx_tpu.envs.bench_tasks import NativeBenchEngine

            kw = {}
            motions = getattr(args, 'amp_motions', None)
            if motions:
                from guardx_tpu.utils.poselib import default_motion_files

                names = [m.strip() for m in motions.split(',')]
                kw['motion_files'] = [
                    m if os.path.sep in m else default_motion_files([m])[0]
                    for m in names
                ]
            return NativeBenchEngine(
                name, env_num=args.env_num, num_steps=args.max_ep_len,
                seed=args.seed, **kw,
            )
        from guardx_tpu.envs.wrappers import IsaacGymWrapper

        return IsaacGymWrapper(config)
    if 'Isaac-' in args.task:
        from guardx_tpu.envs.wrappers import IsaacLabWrapper

        return IsaacLabWrapper(args.env_unwrapped)
    from guardx_tpu.envs.engine import Engine

    return Engine(config)
