"""Epoch logging: colorized stdout table + TSV progress.txt + config.json.

Behavioral rebuild of the reference's Logger/EpochLogger
(reference: safe_rl_libX/guard_utils/logx.py:109-381) minus MPI (stats are
already global on device — the mesh psums them; SURVEY.md §5) and minus
torch: model/state saving goes through joblib pickles of host numpy pytrees,
and full resumable checkpoints live in guardx_tpu.utils.checkpoint.

Output format parity (the reference's plotters read these):
- progress.txt: tab-separated, header row first, one row per dump_tabular
- config.json: sorted, indented JSON of the experiment config
- stdout: the boxed "| key | value |" table with %8.3g values
- dir convention: ./logs/<exp_name>/<exp_name>_s<seed>/
"""

from __future__ import annotations

import atexit
import json
import os
import os.path as osp
import time

import joblib
import numpy as np

from guardx_tpu.utils.serialization import convert_json

# ANSI SGR foreground codes (same palette the reference's console output
# uses, logx.py:19-28, so session transcripts look identical)
_ANSI_FG = {
    'gray': 30, 'red': 31, 'green': 32, 'yellow': 33, 'blue': 34,
    'magenta': 35, 'cyan': 36, 'white': 37, 'crimson': 38,
}


def colorize(text: str, color: str, bold: bool = False,
             highlight: bool = False) -> str:
    """Wrap ``text`` in ANSI escape codes for terminal color."""
    code = _ANSI_FG[color] + (10 if highlight else 0)
    sgr = f"{code};1" if bold else f"{code}"
    return f"\x1b[{sgr}m{text}\x1b[0m"


def statistics_scalar(vals, with_min_and_max=False):
    """Mean/std (and min/max) of an array of values (the reference's
    mpi_statistics_scalar, mpi_tools.py:70-92, single-process)."""
    x = np.asarray(vals, dtype=np.float32).flatten()
    n = max(len(x), 1)
    mean = float(np.sum(x) / n)
    std = float(np.sqrt(np.sum((x - mean) ** 2) / n))
    if with_min_and_max:
        mn = float(np.min(x)) if len(x) else np.inf
        mx = float(np.max(x)) if len(x) else -np.inf
        return mean, std, mn, mx
    return mean, std


def setup_logger_kwargs(exp_name, seed=None, data_dir=None, datestamp=False):
    """./logs/<exp_name>[/<exp_name>_s<seed>] (reference logx.py:44-107)."""
    ymd_time = time.strftime("%Y-%m-%d_") if datestamp else ''
    relpath = ''.join([ymd_time, exp_name])
    if seed is not None:
        if datestamp:
            hms_time = time.strftime("%Y-%m-%d_%H-%M-%S")
            subfolder = ''.join([hms_time, '-', exp_name, '_s', str(seed)])
        else:
            subfolder = ''.join([exp_name, '_s', str(seed)])
        relpath = osp.join(relpath, subfolder)
    data_dir = data_dir or './logs/'
    return dict(output_dir=osp.join(data_dir, relpath), exp_name=exp_name)


class Logger:
    """Tabular diagnostics + config + state saving (reference logx.py:109-275)."""

    def __init__(self, output_dir=None, output_fname='progress.txt',
                 exp_name=None):
        self.output_dir = output_dir or "/tmp/experiments/%i" % int(time.time())
        if osp.exists(self.output_dir):
            print("Warning: Log dir %s already exists! Storing info there "
                  "anyway." % self.output_dir)
        else:
            os.makedirs(self.output_dir)
        self.output_file = open(osp.join(self.output_dir, output_fname), 'w')
        atexit.register(self.output_file.close)
        print(colorize("Logging data to %s" % self.output_file.name,
                       'green', bold=True))
        self.first_row = True
        self.log_headers = []
        self.log_current_row = {}
        self.exp_name = exp_name
        self.model_saver_elements = None

    def log(self, msg, color='green'):
        print(colorize(msg, color, bold=True))

    def log_tabular(self, key, val):
        if self.first_row:
            self.log_headers.append(key)
        elif key not in self.log_headers:
            raise KeyError(
                f"new metric '{key}' after the first epoch — the TSV header "
                "is fixed at the first dump_tabular()"
            )
        if key in self.log_current_row:
            raise KeyError(
                f"metric '{key}' set twice this epoch (missing "
                "dump_tabular()?)"
            )
        self.log_current_row[key] = val

    def save_config(self, config):
        # copy before annotating: convert_json passes serializable dicts
        # through unchanged, and callers pass live dicts (vars(args))
        config_json = dict(convert_json(config))
        if self.exp_name is not None:
            config_json['exp_name'] = self.exp_name
        output = json.dumps(config_json, separators=(',', ':\t'), indent=4,
                            sort_keys=True)
        print(colorize('Saving config:\n', color='cyan', bold=True))
        print(output)
        with open(osp.join(self.output_dir, "config.json"), 'w') as out:
            out.write(output)

    def setup_model_saver(self, what_to_save):
        """Register a pytree (e.g. AlgoState) for saving alongside state
        (the reference's setup_pytorch_saver, logx.py:232-246)."""
        self.model_saver_elements = what_to_save

    def save_state(self, state_dict, itr=None):
        """joblib-pickle a state dict, plus the registered model pytree as
        host numpy under jax_save/model.pkl (reference logx.py:200-230's
        vars.pkl + pyt_save/model.pt)."""
        fname = 'vars.pkl' if itr is None else 'vars%d.pkl' % itr
        try:
            joblib.dump(state_dict, osp.join(self.output_dir, fname))
        except Exception:
            self.log('Warning: could not pickle state_dict.', color='red')
        if self.model_saver_elements is not None:
            self._model_simple_save(itr)

    def _model_simple_save(self, itr=None):
        import jax

        fpath = osp.join(self.output_dir, 'jax_save')
        os.makedirs(fpath, exist_ok=True)
        fname = 'model' + ('%d' % itr if itr is not None else '') + '.pkl'
        host = jax.tree_util.tree_map(np.asarray,
                                      jax.device_get(self.model_saver_elements))
        joblib.dump(host, osp.join(fpath, fname))

    def dump_tabular(self):
        """Flush the epoch's metrics: boxed stdout table + one TSV row.

        Same on-disk/console format as the reference (logx.py:273-299) so
        its plotters and log parsers keep working: header written once,
        values %8.3g-formatted in a right-aligned ``| key | value |`` box.
        """
        width = max(15, *(len(k) for k in self.log_headers))
        rule = '-' * (22 + width)
        row = [self.log_current_row.get(k, "") for k in self.log_headers]

        lines = [rule]
        for key, val in zip(self.log_headers, row):
            shown = f"{val:8.3g}" if hasattr(val, "__float__") else val
            lines.append(f"| {key:>{width}} | {shown:>15} |")
        lines.append(rule)
        print("\n".join(lines), flush=True)

        if self.output_file is not None:
            if self.first_row:
                self.output_file.write("\t".join(self.log_headers) + "\n")
            self.output_file.write(
                "\t".join(str(v) for v in row) + "\n"
            )
            self.output_file.flush()
        self.log_current_row.clear()
        self.first_row = False


class EpochLogger(Logger):
    """store()/log_tabular() epoch-statistics variant (reference
    logx.py:301-381)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.epoch_dict = dict()

    def store(self, **kwargs):
        for k, v in kwargs.items():
            if k not in self.epoch_dict:
                self.epoch_dict[k] = []
            self.epoch_dict[k].append(v)

    def log_tabular(self, key, val=None, with_min_and_max=False,
                    average_only=False):
        if val is not None:
            super().log_tabular(key, val)
        else:
            v = self.epoch_dict[key]
            vals = (np.concatenate(v)
                    if isinstance(v[0], np.ndarray) and len(v[0].shape) > 0
                    else v)
            stats = statistics_scalar(vals, with_min_and_max=with_min_and_max)
            super().log_tabular(key if average_only else 'Average' + key,
                                stats[0])
            if not average_only:
                super().log_tabular('Std' + key, stats[1])
            if with_min_and_max:
                super().log_tabular('Max' + key, stats[3])
                super().log_tabular('Min' + key, stats[2])
        self.epoch_dict[key] = []

    def get_stats(self, key):
        v = self.epoch_dict[key]
        vals = (np.concatenate(v)
                if isinstance(v[0], np.ndarray) and len(v[0].shape) > 0
                else v)
        return statistics_scalar(vals)
