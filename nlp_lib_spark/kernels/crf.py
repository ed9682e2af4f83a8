"""Linear-chain sequence tagger (the CRF annotator family).

Re-expresses the reference's Mallet linear-chain CRF stack —
``ml/crf/CRFTrainer.java`` (offline label-likelihood training),
``ml/crf/CRFSeqTagger.java`` (load + per-sentence Viterbi transduction),
consumed by ``ling/ann/DiscourseMarkerAnnotator.java`` (``DIS_CON`` B/I/O)
and ``ling/ann/ClauseBoundaryCRFAnnotator.java`` — as a deterministic
averaged structured perceptron:

* same model family (linear-chain: per-position emission features + tag
  transition weights, exact Viterbi decode);
* training is offline and corpus-scale-small (SURVEY §3.2), so it runs
  driver-side like ``kernels/scoring.train_logreg``; determinism is this
  engine's contract (fixed iteration order, lexicographic tag tie-breaks),
  where Mallet's threaded L-BFGS is not;
* the runtime ships as a plain weight dict broadcast to executors and
  decoded inside Arrow batches (operators/seqtag.py) — no model server,
  mirroring how the MaxEnt path ships.

Feature template (the standard CRF token window, matching the shape of
Mallet's SimpleTagger pipes the reference feeds): word identity, lowercase,
prefix/suffix-3, POS, and the previous/next word+POS.
"""

from __future__ import annotations

import os

DEFAULT_CRF_MODEL_PATH = os.path.join(
    os.path.dirname(__file__), os.pardir, "models", "discourse_crf.json")

from collections import defaultdict

Weights = dict[str, float]

START = "<S>"


def position_features(tokens: list[str], pos: list[str], i: int) -> list[str]:
    """Emission features for one position (pure, shared by train/decode)."""
    n = len(tokens)
    w = tokens[i]
    lw = w.lower()
    f = [
        f"w={lw}",
        f"pre3={lw[:3]}",
        f"suf3={lw[-3:]}",
        f"pos={pos[i] if pos else ''}",
        f"pw={tokens[i - 1].lower() if i > 0 else START}",
        f"nw={tokens[i + 1].lower() if i + 1 < n else '</S>'}",
        f"ppos={pos[i - 1] if pos and i > 0 else START}",
        f"npos={pos[i + 1] if pos and i + 1 < n else '</S>'}",
    ]
    return f


def _emit_key(tag: str, feat: str) -> str:
    return tag + "\x00" + feat


_TRANS = "\x00T\x00"  # sentinel no tag name can collide with


def _trans_key(prev: str, tag: str) -> str:
    return _TRANS + prev + "\x00" + tag


def viterbi(tokens: list[str], pos: list[str], tags: list[str],
            weights: Weights) -> list[str]:
    """Exact Viterbi decode; ties break toward the lexicographically
    smaller tag (deterministic across partitions/engines)."""
    n = len(tokens)
    if n == 0:
        return []
    tagset = sorted(tags)
    feats = [position_features(tokens, pos, i) for i in range(n)]
    emit0 = {t: sum(weights.get(_emit_key(t, f), 0.0) for f in feats[0])
             + weights.get(_trans_key(START, t), 0.0) for t in tagset}
    score = {t: emit0[t] for t in tagset}
    back: list[dict[str, str]] = []
    for i in range(1, n):
        emit = {t: sum(weights.get(_emit_key(t, f), 0.0) for f in feats[i])
                for t in tagset}
        nxt: dict[str, float] = {}
        bp: dict[str, str] = {}
        for t in tagset:
            best_s, best_p = None, None
            for p in tagset:
                s = score[p] + weights.get(_trans_key(p, t), 0.0)
                if best_s is None or s > best_s:
                    best_s, best_p = s, p
            nxt[t] = best_s + emit[t]
            bp[t] = best_p
        score = nxt
        back.append(bp)
    # resolve final ties deterministically: max score, then lex-min tag
    best = max(score.values())
    last = min(t for t in tagset if score[t] == best)
    out = [last]
    for bp in reversed(back):
        out.append(bp[out[-1]])
    out.reverse()
    return out


def train_perceptron(x: list[tuple[list[str], list[str]]],
                     y: list[list[str]], epochs: int = 8) -> Weights:
    """Averaged structured perceptron over (tokens, pos) -> tag sequences.

    Deterministic: fixed instance order per epoch (the reference shuffles
    doc ids with an unseeded Random before folding — determinism is this
    engine's contract), integer-count averaging."""
    tags = sorted({t for seq in y for t in seq})
    w: Weights = defaultdict(float)
    acc: Weights = defaultdict(float)
    step = 0

    def bump(key: str, delta: float) -> None:
        w[key] += delta
        acc[key] += delta * step

    for _ in range(epochs):
        for (tokens, pos), gold in zip(x, y):
            step += 1
            pred = viterbi(tokens, pos, tags, w)
            if pred == gold:
                continue
            prev_g, prev_p = START, START
            for i, (g, p) in enumerate(zip(gold, pred)):
                if g != p:
                    for f in position_features(tokens, pos, i):
                        bump(_emit_key(g, f), 1.0)
                        bump(_emit_key(p, f), -1.0)
                if (g, prev_g) != (p, prev_p):
                    bump(_trans_key(prev_g, g), 1.0)
                    bump(_trans_key(prev_p, p), -1.0)
                prev_g, prev_p = g, p
    total = step if step else 1
    return {k: v - acc[k] / total for k, v in w.items()
            if v - acc[k] / total != 0.0}


def tagset_of(weights: Weights) -> list[str]:
    """Recover the tag inventory from a weight dict."""
    tags = set()
    for k in weights:
        if k.startswith(_TRANS):
            p, t = k[len(_TRANS):].split("\x00")
            if p != START:
                tags.add(p)
            tags.add(t)
        else:
            tags.add(k.split("\x00", 1)[0])
    tags.discard(START)
    return sorted(tags)
