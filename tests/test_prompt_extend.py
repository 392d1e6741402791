"""Prompt-extend tests: system-prompt selection parity
(prompt_extend.py:85-95 semantics + :26-49 registry), offline expander
determinism, and the DashScope transport envelope."""

import json

import pytest

from univid_tpu.utils.prompt_extend import (DashScopePromptExpander,
                                            OfflinePromptExpander,
                                            PromptOutput,
                                            default_sys_prompt,
                                            make_prompt_expander,
                                            system_prompts)


def test_system_prompt_registry_complete():
    p = system_prompts()
    assert len(p) == 6
    for k in ("T2V_A14B_ZH_SYS_PROMPT", "T2V_A14B_EN_SYS_PROMPT",
              "I2V_A14B_ZH_SYS_PROMPT", "I2V_A14B_EN_SYS_PROMPT",
              "I2V_A14B_EMPTY_ZH_SYS_PROMPT",
              "I2V_A14B_EMPTY_EN_SYS_PROMPT"):
        assert k in p and len(p[k]) > 200


def test_decide_system_prompt_semantics():
    p = system_prompts()
    # ti2v: t2v/i2v sub-key by is_vl (reference :86-90)
    assert default_sys_prompt("ti2v-5B", "en", is_vl=False) == \
        p["T2V_A14B_EN_SYS_PROMPT"]
    assert default_sys_prompt("ti2v-5B", "zh", is_vl=True) == \
        p["I2V_A14B_ZH_SYS_PROMPT"]
    # i2v with empty prompt -> empty variant (:91-93)
    assert default_sys_prompt("i2v-A14B", "en", prompt="") == \
        p["I2V_A14B_EMPTY_EN_SYS_PROMPT"]
    assert default_sys_prompt("i2v-A14B", "en", prompt="a dog") == \
        p["I2V_A14B_EN_SYS_PROMPT"]
    assert default_sys_prompt("t2v-A14B", "zh") == \
        p["T2V_A14B_ZH_SYS_PROMPT"]


def test_offline_expander_and_factory():
    e = make_prompt_expander("offline", task="ti2v-5B")
    assert isinstance(e, OfflinePromptExpander)
    out = e("a cat on a mat", tar_lang="en", seed=7)
    assert out == PromptOutput(True, "a cat on a mat", 7,
                               default_sys_prompt("ti2v-5B", "en"),
                               "offline")
    # dashscope without a key falls back to offline (hermetic CI)
    e2 = make_prompt_expander("dashscope", task="t2v-A14B")
    assert isinstance(e2, OfflinePromptExpander)


def test_dashscope_transport_envelope(monkeypatch):
    """The expander posts an OpenAI-compatible chat payload and returns
    the first choice; failures retry then fall back to the input."""
    calls = []

    class _Resp:
        def __init__(self, payload):
            self.payload = payload

        def read(self):
            return json.dumps(self.payload).encode()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        body = json.loads(req.data)
        calls.append(body)
        return _Resp({"choices": [{"message": {
            "content": f"EXPANDED: {body['messages'][1]['content']}"}}]})

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    e = DashScopePromptExpander(api_key="k", task="t2v-A14B")
    out = e("a dog", tar_lang="en", seed=3)
    assert out.status and out.prompt == "EXPANDED: a dog"
    assert calls[0]["model"] == "qwen-plus"
    assert calls[0]["messages"][0]["role"] == "system"

    def boom(req, timeout=None):
        raise OSError("no network")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    e2 = DashScopePromptExpander(api_key="k", task="t2v-A14B",
                                 retry_times=2)
    out = e2("a dog", tar_lang="en", seed=3)
    assert not out.status and out.prompt == "a dog"
    assert "no network" in out.message


def test_local_vl_extend_with_img_plumbing():
    """extend_with_img drives the VL processor contract (reference
    prompt_extend.py:369-430): image in the user content list, chat
    template -> processor(text, images) -> generate -> trim past the
    prompt -> batch_decode."""
    import numpy as np
    import torch

    from univid_tpu.utils.prompt_extend import QwenPromptExpander

    calls = {}

    class FakeProcessor:
        def apply_chat_template(self, messages, tokenize,
                                add_generation_prompt):
            calls["messages"] = messages
            return "TEMPLATED"

        def __call__(self, text, images, padding, return_tensors):
            calls["text"] = text
            calls["images"] = images
            return {"input_ids": torch.tensor([[1, 2, 3]])}

        def batch_decode(self, seqs, skip_special_tokens,
                         clean_up_tokenization_spaces):
            return [" ".join(str(int(t)) for t in seqs[0])]

    class FakeModel:
        def generate(self, input_ids, max_new_tokens):
            return torch.cat([input_ids,
                              torch.tensor([[7, 8]])], dim=1)

    exp = object.__new__(QwenPromptExpander)
    exp.processor = FakeProcessor()
    exp.model = FakeModel()
    exp.max_new_tokens = 16
    exp.task = "i2v-A14B"
    exp.is_vl = True

    img = np.zeros((8, 8, 3), np.uint8)
    out = exp.extend_with_img("a prompt", "SYS", image=img, seed=3)
    assert out.status
    assert out.prompt == "7 8"  # only the ids past the input decode
    user = calls["messages"][1]
    assert user["role"] == "user"
    kinds = [c["type"] for c in user["content"]]
    assert kinds == ["image", "text"]
    from PIL import Image
    assert isinstance(calls["images"][0], Image.Image)


def test_local_vl_extend_with_img_requires_vl():
    from univid_tpu.utils.prompt_extend import QwenPromptExpander

    exp = object.__new__(QwenPromptExpander)
    exp.processor = None
    out = exp.extend_with_img("p", "SYS", image=None, seed=0)
    assert not out.status
    assert "is_vl" in out.message
