"""Tooling tests: plotter, video replay, software render, launcher,
profiling hooks (SURVEY.md §2.3 utility components, §5 aux subsystems)."""

import os

import numpy as np
import pytest


def _write_fake_run(run_dir, exp_name='expA', rows=5):
    os.makedirs(run_dir)
    import json

    with open(os.path.join(run_dir, 'config.json'), 'w') as f:
        json.dump({'exp_name': exp_name}, f)
    headers = ['Epoch', 'EpRet', 'EpCost', 'TotalEnvInteracts']
    with open(os.path.join(run_dir, 'progress.txt'), 'w') as f:
        f.write('\t'.join(headers) + '\n')
        for i in range(rows):
            f.write(f'{i}\t{1.0 + i}\t{0.5}\t{100 * (i + 1)}\n')


def test_plot_from_progress(tmp_path):
    from guardx_tpu.utils.plot import make_plots

    _write_fake_run(str(tmp_path / 'logs' / 'expA' / 'expA_s0'))
    _write_fake_run(str(tmp_path / 'logs' / 'expA' / 'expA_s1'))
    outs = make_plots([str(tmp_path / 'logs')], values=('EpRet', 'EpCost'),
                      smooth=2, out_dir=str(tmp_path / 'results'))
    assert len(outs) == 2
    for o in outs:
        assert os.path.getsize(o) > 1000


def test_plot_select_exclude(tmp_path):
    from guardx_tpu.utils.plot import make_plots

    _write_fake_run(str(tmp_path / 'logs' / 'keep' / 'keep_s0'))
    with pytest.raises(SystemExit):
        make_plots([str(tmp_path / 'logs' / 'keep')], values=('EpRet',),
                   exclude=['keep'], out_dir=str(tmp_path / 'results'))


def test_smooth_series():
    from guardx_tpu.utils.plot import smooth_series

    x = np.array([0.0, 10.0, 0.0, 10.0])
    out = smooth_series(x, 3)
    assert out.shape == x.shape
    assert 0 < out[1] < 10


def test_engine_software_render():
    from guardx_tpu.envs import Engine

    env = Engine({'env_num': 2, 'num_steps': 8, 'hazards_num': 8,
                  '_seed': 0, 'gx_layout_pool': 2048})
    env.reset()
    frame = env._render_topdown(0, 320, 240)
    assert frame.shape == (240, 320, 3) and frame.dtype == np.uint8
    assert frame.std() > 1  # not a blank image

    # overlay parity (reference render_lidar/render_compass/violation
    # sphere, engine.py:946-1070): lidar rings + compass resolve from the
    # live state, and the violation flash keys off info['cost']
    import jax.numpy as jnp

    env.step(jnp.zeros((2, env.action_space.shape[0])))
    ov = env._overlay_data(0)
    assert len(ov['lidars']) == 2  # hazards + goal lidar rings
    assert ov['lidars'][0][0].shape == (env.lidar_num_bins,)
    assert ov['compass'] is not None and ov['compass'].shape == (2,)
    frame2 = env._render_topdown(0, 320, 240)
    assert frame2.std() > 1


def test_video_replay(tmp_path, monkeypatch):
    """End-to-end: train 1 epoch with model_save, then replay to mp4."""
    from guardx_tpu import train, video

    monkeypatch.chdir(tmp_path)
    args = train.get_parser().parse_args([
        '--algo', 'a2c', '--task', 'Goal_Point_8Hazards',
        '--env_num', '4', '--max_ep_len', '4', '--epochs', '1',
        '--model_save', '--save_freq', '1',
    ])
    train.run(args)
    exp = train.make_exp_name(args)
    run_dir = str(tmp_path / 'logs' / exp / f'{exp}_s0')
    frames, ret, cost = video.replay(
        run_dir, 'Goal_Point_8Hazards', max_ep_len=5,
        out_dir=str(tmp_path / 'video'), video_name='t',
    )
    assert frames >= 1
    assert os.path.getsize(tmp_path / 'video' / 't.mp4') > 0


def test_run_launcher(tmp_path):
    from guardx_tpu.run import run_jobs

    results = run_jobs(['true', 'false', 'echo hi'], parallel=2,
                       log_dir=str(tmp_path / 'rl'))
    assert [rc for _, rc in results] == [0, 1, 0]
    assert (tmp_path / 'rl' / 'job002.log').read_text().endswith('hi\n')


def test_profiling_hooks(tmp_path):
    import jax.numpy as jnp
    from guardx_tpu.utils.profiling import step_timer, trace

    out = {}
    with step_timer(out, 'TEnv'):
        pass
    assert out['TEnv'] >= 0
    with trace(str(tmp_path / 'tr')):
        jnp.ones(4).sum().block_until_ready()
    assert any('xplane' in f or 'trace' in f
               for _, _, fs in os.walk(tmp_path / 'tr') for f in fs)
