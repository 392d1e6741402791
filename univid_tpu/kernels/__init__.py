from .attention import attention, mha_reference
