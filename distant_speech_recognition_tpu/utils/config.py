"""Reference-compatible JSON configuration surface.

The reference's de-facto public config API is the JSON dict consumed by its
unit_test drivers (SURVEY.md §5.6; unit_test/confs/*.json +
test_online_beamforming.py:91-183): ``array_type``, ``microphone_positions``,
``target.positions`` ([[time, [coords...]], ...]), ``noises``,
``beamformer{type,...}``, ``postfilter{type,subtype,alpha}``.  This module
parses that exact schema into this framework's pipeline configuration.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from . import geometry

SSPEED = 343740.0

__all__ = ["load_ap_conf", "parse_ap_conf", "target_delays"]


def load_ap_conf(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _clean_position(pos):
    """Reference positions use null for unused coordinates
    (check_position_data_format, test_online_beamforming.py)."""
    return [0.0 if p is None else float(p) for p in pos]


def target_delays(ap_conf: dict, which: str = "target", index: int = 0) -> np.ndarray:
    """Time delays for the target (or a noise source) from the config
    geometry, matching calc_delays dispatch (pybeamformer.py:144-154)."""
    mpos = np.asarray(ap_conf["microphone_positions"], dtype=np.float64)
    src = ap_conf[which] if which == "target" else ap_conf["noises"][index]
    _, pos = src["positions"][0]
    pos = _clean_position(pos)
    array_type = ap_conf.get("array_type", "nearfield")
    if array_type == "linear":
        return geometry.calc_la_delays(mpos[:, :1], pos[0], sspeed=SSPEED)
    return geometry.calc_delays(array_type, mpos, pos, sspeed=SSPEED)


def parse_ap_conf(ap_conf: dict, fb_params, samplerate: float = 16000.0):
    """Reference JSON dict -> (PipelineConfig, mpos, delays, extra).

    Beamformer types map per test_online_beamforming.py:91-124:
    delay_and_sum / lcmv / super_directive / gsclms / gscrls.
    Postfilter subtype is the reference's bit-flag pf type.
    """
    from ..models.adaptive_gsc import GSCLMSConfig, GSCRLSConfig
    from ..models.pipeline import PipelineConfig

    bf_conf: dict[str, Any] = ap_conf["beamformer"]
    btype = bf_conf["type"]
    mpos = np.asarray(ap_conf["microphone_positions"], dtype=np.float64)
    delays = target_delays(ap_conf)

    kwargs: dict[str, Any] = {}
    extra: dict[str, Any] = {}
    if btype == "delay_and_sum":
        beamformer = "ds"
    elif btype == "lcmv":
        beamformer = "lcmv"
        extra["noise_delays"] = [
            target_delays(ap_conf, "noises", i)
            for i in range(len(ap_conf.get("noises", [])))
        ]
    elif btype == "super_directive":
        beamformer = "sd_mvdr"
        kwargs["sd_mu"] = bf_conf.get("diagonal_load", 0.01)
    elif btype == "gsclms":
        beamformer = "gsc_lms"
        kwargs["lms"] = GSCLMSConfig(
            beta=bf_conf.get("beta", 0.97),
            gamma=bf_conf.get("gamma", 0.01),
            init_diagonal_load=bf_conf.get("init_diagonal_load", 1.0e6),
            regularization_param=bf_conf.get("regularization_param", 1.0e-4),
            energy_floor=bf_conf.get("energy_floor", 90),
            sil_thresh=bf_conf.get("sil_thresh", 1.0e8),
            max_wa_l2norm=bf_conf.get("max_wa_l2norm", 100.0),
            min_frames=bf_conf.get("min_frames", 128),
            slowdown_after=bf_conf.get("slowdown_after", 4096),
        )
    elif btype == "gscrls":
        beamformer = "gsc_rls"
        kwargs["rls"] = GSCRLSConfig(
            beta=bf_conf.get("beta", 0.97),
            gamma=bf_conf.get("gamma", 0.04),
            mu=bf_conf.get("mu", 0.97),
            init_diagonal_load=bf_conf.get("init_diagonal_load", 1.0e6),
            regularization_param=bf_conf.get("regularization_param", 1.0e-2),
            sil_thresh=bf_conf.get("sil_thresh", 1.0e8),
            constraint_option=bf_conf.get("constraint_option", 3),
            alpha2=bf_conf.get("alpha2", 10.0),
            max_wa_l2norm=bf_conf.get("max_wa_l2norm", 100.0),
            min_frames=bf_conf.get("min_frames", 128),
            slowdown_after=bf_conf.get("slowdown_after", 4096),
        )
    else:
        raise KeyError(f"Invalid beamformer type: {btype}")

    pf_conf = ap_conf.get("postfilter")
    if pf_conf is not None:
        ptype = pf_conf["type"]
        if ptype not in ("zelinski", "mccowan", "lefkimmiatis", "apab"):
            raise KeyError(f"Invalid post-filter type: {ptype}")
        kwargs["postfilter"] = ptype
        kwargs["pf_alpha"] = pf_conf.get(
            "alpha", 0.8 if ptype == "lefkimmiatis" else 0.6
        )
        kwargs["pf_type"] = pf_conf.get("subtype", 2)

    cfg = PipelineConfig(
        fb=fb_params, samplerate=float(samplerate), beamformer=beamformer, **kwargs
    )
    return cfg, mpos, delays, extra
