"""Pyramid Reflection tests with mock BAGEL/judge/scorer components:
state-machine control flow, MMR, trace format."""

import numpy as np

from univid_tpu.reflection.mmr import mmr_select
from univid_tpu.reflection.clients import make_reflection_clients
from univid_tpu.reflection.reflexion import (
    ReflexionConfig,
    reflexion_answer_one,
)


class MockBagel:
    def __init__(self):
        self.calls = []

    def __call__(self, image=None, text=None, **kw):
        self.calls.append(("frame_caption", text))
        return {"text": "a red ball on grass", "image": None}

    def video_understanding(self, video, text, **kw):
        self.calls.append(("qa", len(video)))
        return {"text": f"answer from {len(video)} frames", "image": None}


class MockScorer:
    def __init__(self, n=64):
        rng = np.random.default_rng(0)
        self.embs = rng.standard_normal((n, 8))
        self.embs /= np.linalg.norm(self.embs, axis=-1, keepdims=True)

    def emb_text(self, q):
        v = np.random.default_rng(abs(hash(q)) % 2**31).standard_normal(8)
        return (v / np.linalg.norm(v))[None]

    def emb_imgs(self, frames, bs=64):
        return self.embs[: len(frames)]

    def rank_frames(self, frames, query, topk, bs=64):
        t = self.emb_text(query)[0]
        sims = self.embs[: len(frames)] @ t
        idx = np.argsort(-sims)[:topk]
        return idx.tolist(), sims[idx].tolist()


class AcceptingJudge:
    def classify_qtype(self, q):
        return {"qtype": "dynamic" if "how many" in q.lower()
                else "static", "rationale": "mock"}

    def summarize_frames(self, notes):
        return "global: " + "; ".join(notes[:2])

    def eval_answer(self, q, cap, ans):
        return {"score": 0.9, "verdict": "accept", "brief_reason": "ok"}

    def answer_from_global(self, q, cap):
        return "global answer"


def _frames(n=64):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
            for _ in range(n)]


def test_mmr_select_diversity():
    q = np.asarray([1.0, 0.0, 0.0])
    embs = np.asarray([
        [0.8, 0.6, 0.0],    # best query match
        [0.78, 0.62, 0.0],  # near-duplicate of 0 (high redundancy)
        [0.6, -0.8, 0.0],   # lower match but orthogonal to 0
    ])
    embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
    sel = mmr_select(embs, q, 2, lam=0.5)
    assert sel[0] == 0
    assert sel[1] == 2  # diversity beats near-duplicate


def test_noop_clients():
    refl, judge = make_reflection_clients(None)
    assert refl.reflect("q", "c", "a", {}) == {"refined_query": ""}
    assert judge.classify_qtype("q")["qtype"] == "static"
    assert judge.eval_answer("q", "c", "a")["verdict"] == "reject"


def test_static_accept_first_round():
    bagel = MockBagel()
    refl, _ = make_reflection_clients(None)
    cfg = ReflexionConfig(pool_frames=16, caption_seed_frames=2,
                          static_seq=(4, 8, 16))
    ans, trace = reflexion_answer_one(
        "video1.mp4", "what color is the ball?", bagel, refl,
        AcceptingJudge(), MockScorer(), cfg, frames=_frames(16))
    assert ans == "answer from 4 frames"
    assert trace["qtype_init"] == "static"
    assert len(trace["rounds"]) == 1
    assert trace["rounds"][0]["K"] == 4
    assert trace["final_answer"] == ans


def test_static_rejects_use_fallback():
    """No-op judge rejects everything -> 3 rounds + global fallback ->
    last bagel answer (global says 'Not enough evidence')."""
    bagel = MockBagel()
    refl, judge = make_reflection_clients(None)
    cfg = ReflexionConfig(pool_frames=16, caption_seed_frames=2,
                          static_seq=(4, 8, 16))
    ans, trace = reflexion_answer_one(
        "video1.mp4", "what is shown?", bagel, refl, judge, MockScorer(),
        cfg, frames=_frames(16))
    assert len(trace["rounds"]) == 3
    assert [r["K"] for r in trace["rounds"]] == [4, 8, 16]
    assert "fallback" in trace
    assert ans == "answer from 16 frames"  # last bagel answer


def test_dynamic_branch_mmr_pyramid():
    bagel = MockBagel()
    refl, _ = make_reflection_clients(None)

    class RejectTwice(AcceptingJudge):
        def __init__(self):
            self.n = 0

        def eval_answer(self, q, cap, ans):
            self.n += 1
            if self.n <= 2:
                return {"score": 0.2, "verdict": "reject",
                        "brief_reason": "no"}
            return {"score": 0.9, "verdict": "accept", "brief_reason": "ok"}

    cfg = ReflexionConfig(pool_frames=64, caption_seed_frames=2,
                          dynamic_seq=(64, 32, 16))
    ans, trace = reflexion_answer_one(
        "video2.mp4", "How many times does the dog jump?", bagel, refl,
        RejectTwice(), MockScorer(64), cfg, frames=_frames(64))
    assert trace["qtype_init"] == "dynamic"
    assert [r["K"] for r in trace["rounds"]] == [64, 32, 16]
    assert ans == "answer from 16 frames"


def test_static_cumulative_selection_semantics():
    """Reference 4->8->16 semantics (eval_understanding.py:598-615): each
    round KEEPS the previously selected frames and tops up only
    K - len(selected) new ones, excluded from re-selection."""
    bagel = MockBagel()
    refl, judge = make_reflection_clients(None)

    class SpyScorer(MockScorer):
        def __init__(self):
            super().__init__(16)
            self.embed_calls = []
            self.text_calls = 0

        def emb_imgs(self, frames, bs=64):
            self.embed_calls.append(len(frames))
            return super().emb_imgs(frames, bs=bs)

        def emb_text(self, q):
            self.text_calls += 1
            return super().emb_text(q)

    scorer = SpyScorer()
    cfg = ReflexionConfig(pool_frames=16, caption_seed_frames=2,
                          static_seq=(4, 8, 16))
    _, trace = reflexion_answer_one(
        "v.mp4", "what?", bagel, refl, judge, scorer, cfg,
        frames=_frames(16))
    # the pool is embedded ONCE (later rounds are text-tower-only
    # re-ranks over the cached embeddings); each round's top-up keeps
    # previously selected frames and adds only K - len(selected) new,
    # excluded from re-selection -> cumulative K per round stays 4/8/16
    assert scorer.embed_calls == [16]
    assert scorer.text_calls == 3
    assert [r["K"] for r in trace["rounds"]] == [4, 8, 16]


def test_accept_by_score_threshold():
    """score >= 0.7 accepts even when verdict says reject
    (eval_understanding.py:627-631)."""
    bagel = MockBagel()
    refl, _ = make_reflection_clients(None)

    class ScoreOnly(AcceptingJudge):
        def eval_answer(self, q, cap, ans):
            return {"score": 0.75, "verdict": "reject",
                    "brief_reason": "meh"}

    cfg = ReflexionConfig(pool_frames=16, caption_seed_frames=2,
                          static_seq=(4, 8, 16))
    ans, trace = reflexion_answer_one(
        "v.mp4", "what?", bagel, refl, ScoreOnly(), MockScorer(16), cfg,
        frames=_frames(16))
    assert len(trace["rounds"]) == 1 and ans == "answer from 4 frames"


def test_fallback_reason_strings_match_reference():
    """Fallback reasons are the exact reference trace constants
    (eval_understanding.py:639-646)."""
    bagel = MockBagel()
    refl, _ = make_reflection_clients(None)
    cfg = ReflexionConfig(pool_frames=16, caption_seed_frames=2,
                          static_seq=(4, 8, 16))

    class RejectingJudgeInformative(AcceptingJudge):
        def eval_answer(self, q, cap, ans):
            return {"score": 0.1, "verdict": "reject", "brief_reason": "no"}

        def answer_from_global(self, q, cap):
            return "the ball is red"

    ans, trace = reflexion_answer_one(
        "v.mp4", "what?", bagel, refl, RejectingJudgeInformative(),
        MockScorer(16), cfg, frames=_frames(16))
    assert trace["fallback"]["reason"] == "final_score_below_0.7"
    assert ans == "the ball is red"  # informative global answer wins

    class RejectingJudgeUseless(RejectingJudgeInformative):
        def answer_from_global(self, q, cap):
            return "Not enough evidence."

    ans2, trace2 = reflexion_answer_one(
        "v.mp4", "what?", bagel, refl, RejectingJudgeUseless(),
        MockScorer(16), cfg, frames=_frames(16))
    assert trace2["fallback"]["reason"] == \
        "final_score_below_0.7_and_global_not_enough"
    assert ans2 == "answer from 16 frames"  # last bagel answer
