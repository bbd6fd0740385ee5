"""Caption metrics: BLEU-4, ROUGE-L, CIDEr-D, METEOR-lite.

Pure-numpy rebuilds of the pycocoevalcap metrics the reference uses for
VideoInfer (ref: evaluation/videoinfer/eval.py:8-100 — BLEU-4/CIDEr/METEOR/
ROUGE + MiniLM sentence similarity). Formulas follow the original papers /
pycocoevalcap implementations:
  * BLEU-4: corpus-level, uniform weights, brevity penalty, closest ref len.
  * ROUGE-L: F-beta with beta=1.2 over LCS (pycocoevalcap convention).
  * CIDEr-D: tf-idf 1-4gram cosine with length gaussian penalty (sigma 6),
    clipped counts, *10 scaling.
  * METEOR-lite: unigram-overlap harmonic mean with fragmentation penalty
    (exact matches only — the full METEOR needs WordNet, unavailable
    offline; flagged in the returned key name).
MiniLM sentence similarity is pluggable via `sentence_similarity_fn`.
"""
from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

_PUNCT = re.compile(r"[^\w\s]")


def tokenize(s: str) -> List[str]:
    return _PUNCT.sub(" ", s.lower()).split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(
        tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    )


# ---------------------------------------------------------------- BLEU
def bleu4(
    hypotheses: Sequence[str], references: Sequence[Sequence[str]]
) -> float:
    """Corpus BLEU-4 with closest-ref-length brevity penalty."""
    clipped = np.zeros(4)
    totals = np.zeros(4)
    hyp_len = 0
    ref_len = 0
    for hyp, refs in zip(hypotheses, references):
        h = tokenize(hyp)
        rs = [tokenize(r) for r in refs]
        hyp_len += len(h)
        ref_len += min((abs(len(r) - len(h)), len(r)) for r in rs)[1]
        for n in range(1, 5):
            hc = _ngrams(h, n)
            max_ref = Counter()
            for r in rs:
                rc = _ngrams(r, n)
                for g, c in rc.items():
                    max_ref[g] = max(max_ref[g], c)
            totals[n - 1] += max(sum(hc.values()), 0)
            clipped[n - 1] += sum(
                min(c, max_ref.get(g, 0)) for g, c in hc.items()
            )
    precisions = np.where(totals > 0, clipped / np.maximum(totals, 1), 0.0)
    if (precisions == 0).any():
        # smooth: standard epsilon to avoid log(0) on short corpora
        precisions = np.maximum(precisions, 1e-9)
    log_p = np.mean(np.log(precisions))
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    return float(bp * math.exp(log_p))


# ---------------------------------------------------------------- ROUGE-L
def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    dp = np.zeros((len(a) + 1, len(b) + 1), np.int32)
    for i, x in enumerate(a, 1):
        for j, y in enumerate(b, 1):
            dp[i, j] = (
                dp[i - 1, j - 1] + 1 if x == y
                else max(dp[i - 1, j], dp[i, j - 1])
            )
    return int(dp[-1, -1])


def rouge_l(
    hypotheses: Sequence[str], references: Sequence[Sequence[str]],
    beta: float = 1.2,
) -> float:
    scores = []
    for hyp, refs in zip(hypotheses, references):
        h = tokenize(hyp)
        best = 0.0
        for r in refs:
            rt = tokenize(r)
            lcs = _lcs_len(h, rt)
            if lcs == 0:
                continue
            prec = lcs / len(h) if h else 0.0
            rec = lcs / len(rt) if rt else 0.0
            if prec + rec > 0:
                f = ((1 + beta**2) * prec * rec) / (rec + beta**2 * prec)
                best = max(best, f)
        scores.append(best)
    return float(np.mean(scores)) if scores else 0.0


# ---------------------------------------------------------------- CIDEr-D
def cider_d(
    hypotheses: Sequence[str], references: Sequence[Sequence[str]],
    sigma: float = 6.0,
) -> float:
    n_docs = len(references)
    doc_freq: List[Counter] = [Counter() for _ in range(4)]
    ref_grams = []
    for refs in references:
        per_ref = []
        seen = [set() for _ in range(4)]
        for r in refs:
            rt = tokenize(r)
            grams = [_ngrams(rt, n) for n in range(1, 5)]
            per_ref.append((rt, grams))
            for n in range(4):
                seen[n].update(grams[n].keys())
        for n in range(4):
            for g in seen[n]:
                doc_freq[n][g] += 1
        ref_grams.append(per_ref)

    def tfidf(grams: Counter, n: int):
        vec = {}
        norm = 0.0
        length = max(sum(grams.values()), 1)
        for g, c in grams.items():
            df = max(doc_freq[n].get(g, 0), 1)
            idf = math.log(max(n_docs, 1)) - math.log(df)
            v = (c / length) * idf
            vec[g] = v
            norm += v * v
        return vec, math.sqrt(norm)

    scores = []
    for hyp, per_ref in zip(hypotheses, ref_grams):
        ht = tokenize(hyp)
        h_grams = [_ngrams(ht, n) for n in range(1, 5)]
        score_n = np.zeros(4)
        for rt, rgrams in per_ref:
            delta = len(ht) - len(rt)
            penalty = math.exp(-(delta**2) / (2 * sigma**2))
            for n in range(4):
                hv, hn = tfidf(h_grams[n], n)
                rv, rn = tfidf(rgrams[n], n)
                num = sum(
                    min(hv.get(g, 0), rv.get(g, 0)) * rv.get(g, 0)
                    for g in hv
                )
                if hn > 0 and rn > 0:
                    score_n[n] += penalty * num / (hn * rn)
        score_n /= max(len(per_ref), 1)
        scores.append(10.0 * float(np.mean(score_n)))
    return float(np.mean(scores)) if scores else 0.0


# ---------------------------------------------------------------- METEOR-lite
def meteor_lite(
    hypotheses: Sequence[str], references: Sequence[Sequence[str]],
    alpha: float = 0.9, beta: float = 3.0, gamma: float = 0.5,
) -> float:
    """Exact-match METEOR (no WordNet synonymy/stemming)."""
    scores = []
    for hyp, refs in zip(hypotheses, references):
        h = tokenize(hyp)
        best = 0.0
        for r in refs:
            rt = tokenize(r)
            matches = 0
            used = [False] * len(rt)
            chunks = 0
            prev_matched_j = -2
            for tok in h:
                for j, rtok in enumerate(rt):
                    if not used[j] and tok == rtok:
                        used[j] = True
                        matches += 1
                        if j != prev_matched_j + 1:
                            chunks += 1
                        prev_matched_j = j
                        break
            if matches == 0:
                continue
            p = matches / len(h)
            rcl = matches / len(rt)
            fmean = p * rcl / (alpha * p + (1 - alpha) * rcl)
            frag = chunks / matches
            score = fmean * (1 - gamma * frag**beta)
            best = max(best, score)
        scores.append(best)
    return float(np.mean(scores)) if scores else 0.0


def evaluate_captions(
    hypotheses: Sequence[str],
    references: Sequence[Sequence[str]],
    sentence_similarity_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    out = {
        "BLEU-4": bleu4(hypotheses, references),
        "ROUGE-L": rouge_l(hypotheses, references),
        "CIDEr": cider_d(hypotheses, references),
        "METEOR(exact)": meteor_lite(hypotheses, references),
    }
    if sentence_similarity_fn is not None:
        sims = [
            max(sentence_similarity_fn(h, r) for r in refs)
            for h, refs in zip(hypotheses, references)
        ]
        out["SentenceSim"] = float(np.mean(sims))
    return out


# ---------------------------------------------------------------- MC accuracy
def multiple_choice_accuracy(
    predictions: Sequence[str], answers: Sequence[str]
) -> float:
    """Regex letter-match accuracy (ref: evaluation/videorefer_bench/
    eval_videorefer_bench_q.py:22-45 — "(X)" first, then "X)", then the
    first character)."""

    def extract(s: str) -> str:
        m = re.search(r"\(([A-Z])\)", s)
        if m:
            return m.group(1)
        m = re.search(r"([A-Z])\)", s)
        if m:
            return m.group(1)
        s = s.replace(".", "")
        return s[0] if s else ""

    correct = 0
    for pred, ans in zip(predictions, answers):
        correct += int(extract(pred).lower() == extract(ans).lower())
    return correct / max(len(predictions), 1)
