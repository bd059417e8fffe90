"""Scene-graph construction: which image pairs get fed to the two-view model.

Behavioral contract: /root/reference/dust3r/image_pairs.py:11-104. The
builders here work on index edges first (cheap, testable) and materialize
view-dict pairs at the end.

Graph types:
  complete            - all unordered pairs (i > j)
  swin-k[-noncyclic]  - sliding window of size k (cyclic by default)
  logwin-k[-noncyclic]- power-of-two offsets 1,2,...,2^(k-1)
  oneref-r            - star graph centered at image r
"""
from __future__ import annotations

import numpy as np


def build_edges(n, scene_graph="complete"):
    """Return a list of (i, j) index edges for n images."""
    if scene_graph == "complete":
        return [(i, j) for i in range(n) for j in range(i)]

    if scene_graph.startswith("swin"):
        cyclic = not scene_graph.endswith("noncyclic")
        parts = scene_graph.split("-")
        winsize = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 3
        edges = set()
        for i in range(n):
            for off in range(1, winsize + 1):
                j = i + off
                if cyclic:
                    j = j % n
                if j >= n:
                    continue
                # NOTE: when winsize >= n the cyclic wrap can land j == i;
                # the reference keeps these self-pairs (its swin branch has
                # no `j == i` guard, unlike logwin - image_pairs.py:18-33),
                # so we do too.
                edges.add((min(i, j), max(i, j)))
        return sorted(edges)

    if scene_graph.startswith("logwin"):
        cyclic = not scene_graph.endswith("noncyclic")
        parts = scene_graph.split("-")
        winsize = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 3
        offsets = [2 ** k for k in range(winsize)]
        edges = set()
        for i in range(n):
            for off in offsets:
                for j in (i - off, i + off):
                    if cyclic:
                        j = j % n
                    if j < 0 or j >= n or j == i:
                        continue
                    edges.add((min(i, j), max(i, j)))
        return sorted(edges)

    if scene_graph.startswith("oneref"):
        ref = int(scene_graph.split("-")[1]) if "-" in scene_graph else 0
        return [(ref, j) for j in range(n) if j != ref]

    raise ValueError(f"bad scene_graph={scene_graph!r}")


def make_pairs(imgs, scene_graph="complete", prefilter=None, symmetrize=True):
    """Materialize (view_i, view_j) pairs of image dicts.

    Note the reference's `complete` ordering pairs (imgs[i], imgs[j]) with
    i > j; we preserve that so downstream edge conventions match.
    """
    edges = build_edges(len(imgs), scene_graph)
    pairs = [(imgs[i], imgs[j]) for i, j in edges]
    if symmetrize:
        pairs = pairs + [(b, a) for a, b in pairs]

    if isinstance(prefilter, str) and prefilter.startswith("seq"):
        pairs = filter_pairs_seq(pairs, int(prefilter[3:]))
    elif isinstance(prefilter, str) and prefilter.startswith("cyc"):
        pairs = filter_pairs_seq(pairs, int(prefilter[3:]), cyclic=True)
    return pairs


def _seq_distance(i, j, n, cyclic):
    d = abs(i - j)
    if cyclic:
        d = min(d, abs(i + n - j), abs(i - n - j))
    return d


def _filter_edges_seq(edges, seq_dis_thr, cyclic=False):
    n = max(max(e) for e in edges) + 1
    return [e for e, (i, j) in enumerate(edges)
            if _seq_distance(i, j, n, cyclic) <= seq_dis_thr]


def filter_pairs_seq(pairs, seq_dis_thr, cyclic=False):
    edges = [(a["idx"], b["idx"]) for a, b in pairs]
    kept = _filter_edges_seq(edges, seq_dis_thr, cyclic=cyclic)
    return [pairs[k] for k in kept]


def sel(x, kept):
    """Select entries `kept` from a (possibly nested) collated structure."""
    if isinstance(x, dict):
        return {k: sel(v, kept) for k, v in x.items()}
    if isinstance(x, np.ndarray):
        return x[kept]
    if hasattr(x, "shape"):  # jax array
        return x[np.asarray(kept)]
    if isinstance(x, (tuple, list)):
        return type(x)([x[k] for k in kept])
    raise TypeError(f"cannot select from {type(x)}")


def filter_edges_seq(view1, view2, pred1, pred2, seq_dis_thr, cyclic=False,
                     verbose=True):
    edges = [(int(i), int(j)) for i, j in zip(view1["idx"], view2["idx"])]
    kept = _filter_edges_seq(edges, seq_dis_thr, cyclic=cyclic)
    if verbose:
        print(f">> Filtering edges more than {seq_dis_thr} frames apart: "
              f"kept {len(kept)}/{len(edges)} edges")
    return sel(view1, kept), sel(view2, kept), sel(pred1, kept), sel(pred2, kept)
