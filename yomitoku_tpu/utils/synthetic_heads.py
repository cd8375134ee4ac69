"""Deterministic-detection helpers for random-weight harnesses.

Offline (no checkpoints) the RT-DETR heads emit near-uniform sigmoid
scores: whole classes can miss the detection threshold entirely, and
solo-vs-sharded compiles can flip ulp-level ties at the top-k boundary.
Benchmarks and multichip dryruns that need NON-EMPTY, STABLE detection
sets from random weights use these two transforms:

  * ``spread_score_heads`` — scale every score-head kernel/bias so the
    sigmoid scores saturate toward 0/1 (stable sets, big margins);
  * ``balance_final_score_head`` — re-center the final decoder score
    head's per-class bias on one calibration forward so every class
    appears in the flat (queries x classes) top-k (spreading alone lets
    whichever class drew the luckiest random weights sweep it).
"""

import numpy as np


def spread_score_heads(params, factor=6.0):
    """Scale every dec/enc score-head kernel+bias by ``factor``."""

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        return tree * factor if "score_head" in path else tree

    return walk(params)


def balance_final_score_head(model, calibration_batch):
    """Zero-mean the final decoder score head's per-class logits using
    one forward over ``calibration_batch``; mutates ``model.params``."""
    logits = np.asarray(
        model.forward(calibration_batch)["pred_logits"], np.float32
    )
    class_mean = logits.mean(axis=(0, 1))

    heads = []

    def find(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k.startswith("dec_score_head_") and "bias" in v:
                    heads.append((int(k.rsplit("_", 1)[1]), path + (k,)))
                find(v, path + (k,))

    params = model.params
    find(params)
    assert heads, "no dec_score_head_* in RT-DETR params"
    node = params
    for key in max(heads)[1]:
        node = node[key]
    node["bias"] = node["bias"] - class_mean
    model.params = params  # reset device placement
