"""Import shims that make the ACTUAL reference engine code executable here.

The reference engine (/root/reference/safe_rl_envs/safe_rl_envs/envs/
engine.py) imports `gym` (classic), `xmltodict`, and `mujoco.mjx` — none of
which are installed in this image. Everything its obs/reward/cost/layout
code actually *uses* is available (jax, numpy, mujoco, torch), so we stub
exactly the missing imports and load the reference modules unmodified.

This is the basis of the golden parity tests (VERDICT.md "What's missing"
#2): tools/record_reference_golden.py drives host-MuJoCo physics on the
reference's own compiled world model and evaluates the reference's own
obs()/reward_done()/cost() jax code to produce golden files that
tests/test_golden_parity.py replays through guardx_tpu.

No reference code is copied — it is imported from /root/reference
(read-only) and executed.
"""

from __future__ import annotations

import importlib
import os
import sys
import types
from collections import OrderedDict
from types import SimpleNamespace
import xml.etree.ElementTree as ET

REF_ROOT = "/root/reference"
REF_PKG_DIR = os.path.join(REF_ROOT, "safe_rl_envs", "safe_rl_envs")


# ---------------------------------------------------------------------------
# minimal xmltodict (parse/unparse) on ElementTree — enough for MJCF
# ---------------------------------------------------------------------------

def _xd_parse_elem(elem):
    d = OrderedDict()
    for k, v in elem.attrib.items():
        d["@" + k] = v
    children = list(elem)
    if children:
        for child in children:
            sub = _xd_parse_elem(child)
            if child.tag in d:
                prev = d[child.tag]
                if isinstance(prev, list):
                    prev.append(sub)
                else:
                    d[child.tag] = [prev, sub]
            else:
                d[child.tag] = sub
    text = (elem.text or "").strip()
    if text:
        if d:
            d["#text"] = text
        else:
            return text
    return d


def xd_parse(xml_input):
    root = ET.fromstring(xml_input)
    return OrderedDict([(root.tag, _xd_parse_elem(root))])


def _xd_build_elem(tag, value, parent):
    if isinstance(value, list):
        for item in value:
            _xd_build_elem(tag, item, parent)
        return
    elem = ET.SubElement(parent, tag)
    if isinstance(value, dict):
        for k, v in value.items():
            if k.startswith("@"):
                elem.set(k[1:], str(v))
            elif k == "#text":
                elem.text = str(v)
            else:
                _xd_build_elem(k, v, elem)
    elif value is not None:
        elem.text = str(value)


def xd_unparse(d, pretty=False, **_kw):
    (tag, value), = d.items()
    fake_root = ET.Element("__root__")
    _xd_build_elem(tag, value, fake_root)
    root = list(fake_root)[0]
    if pretty:
        ET.indent(root)
    return ET.tostring(root, encoding="unicode")


def _make_xmltodict():
    mod = types.ModuleType("xmltodict")
    mod.parse = xd_parse
    mod.unparse = xd_unparse
    return mod


# ---------------------------------------------------------------------------
# gym (classic) shim over gymnasium
# ---------------------------------------------------------------------------

def _make_gym():
    import gymnasium

    gym = types.ModuleType("gym")

    class Env:
        pass

    class EzPickle:
        def __init__(self, *args, **kwargs):
            pass

    gym.Env = Env
    gym.spaces = gymnasium.spaces
    utils = types.ModuleType("gym.utils")
    utils.EzPickle = EzPickle
    gym.utils = utils
    vector = types.ModuleType("gym.vector")
    vector.utils = gymnasium.vector.utils
    gym.vector = vector
    return gym, utils, vector


# ---------------------------------------------------------------------------
# mujoco.mjx stub: model metadata passthrough, no device physics
# ---------------------------------------------------------------------------

def _make_mjx():
    mjx = types.ModuleType("mujoco.mjx")

    class Data:  # only used in reference type annotations
        pass

    class Model:
        pass

    def put_model(m):
        return SimpleNamespace(nq=m.nq, nv=m.nv, nu=m.nu, nbody=m.nbody)

    def put_data(m, d):
        return SimpleNamespace(nq=m.nq)

    def _unavailable(*a, **kw):
        raise NotImplementedError(
            "mjx physics is stubbed; drive host mujoco.mj_step instead"
        )

    mjx.Data = Data
    mjx.Model = Model
    mjx.put_model = put_model
    mjx.put_data = put_data
    mjx.step = _unavailable
    mjx.forward = _unavailable
    mjx.device_put = _unavailable
    return mjx


def install_shims():
    """Install all import shims; returns nothing. Idempotent."""
    if "xmltodict" not in sys.modules:
        sys.modules["xmltodict"] = _make_xmltodict()
    if "gym" not in sys.modules or not hasattr(sys.modules["gym"], "Env"):
        gym, utils, vector = _make_gym()
        sys.modules["gym"] = gym
        sys.modules["gym.utils"] = utils
        sys.modules["gym.vector"] = vector

    import mujoco

    if "mujoco.mjx" not in sys.modules:
        mjx = _make_mjx()
        sys.modules["mujoco.mjx"] = mjx
        mujoco.mjx = mjx
    try:
        import mujoco.viewer  # noqa: F401
    except Exception:
        viewer = types.ModuleType("mujoco.viewer")
        viewer.launch_passive = lambda *a, **kw: None
        sys.modules["mujoco.viewer"] = viewer
        mujoco.viewer = viewer

    import jax

    if not hasattr(jax, "tree_map"):  # removed in jax>=0.6; reference uses it
        jax.tree_map = jax.tree.map


def load_reference_engine():
    """Import the reference safe_rl_envs.envs.engine module unmodified.

    Creates the `safe_rl_envs` / `safe_rl_envs.envs` package entries
    pointing at /root/reference (without executing their __init__.py, which
    would pull in the full engine import chain before the stubs are ready)
    and pre-stubs mjx_device (whose real module imports mjx internals).
    """
    install_shims()

    if "safe_rl_envs.envs.engine" in sys.modules:
        return sys.modules["safe_rl_envs.envs.engine"]

    pkg = types.ModuleType("safe_rl_envs")
    pkg.__path__ = [REF_PKG_DIR]
    pkg.__file__ = os.path.join(REF_PKG_DIR, "__init__.py")
    sys.modules["safe_rl_envs"] = pkg

    envs_pkg = types.ModuleType("safe_rl_envs.envs")
    envs_pkg.__path__ = [os.path.join(REF_PKG_DIR, "envs")]
    envs_pkg.__file__ = os.path.join(REF_PKG_DIR, "envs", "__init__.py")
    sys.modules["safe_rl_envs.envs"] = envs_pkg

    mjx_device = types.ModuleType("safe_rl_envs.envs.mjx_device")
    mjx_device.device_put = lambda value, device_id=0: value
    mjx_device.device_get_into = lambda result, value: None
    sys.modules["safe_rl_envs.envs.mjx_device"] = mjx_device

    return importlib.import_module("safe_rl_envs.envs.engine")


# Reference task config (transcribed from
# /root/reference/safe_rl_libX/guard_utils/safe_rl_env_config.py:59-82 —
# the task spec, required verbatim for parity).
GOAL_POINT_8HAZARDS = {
    "robot_base": "xmls/point.xml",
    "task": "goal",
    "goal_size": 0.5,
    "observe_goal_comp": True,
    "observe_hazards": True,
    "constrain_hazards": True,
    "constrain_indicator": False,
    "lidar_num_bins": 16,
    "hazards_num": 8,
    "hazards_size": 0.3,
}
