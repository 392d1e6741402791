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
