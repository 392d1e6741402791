from .scorer import Siglip2Scorer, SiglipTextConfig
from .mmr import mmr_select
from .clients import make_reflection_clients, QwenJudge, DeepSeekReflector
from .reflexion import reflexion_answer_one
