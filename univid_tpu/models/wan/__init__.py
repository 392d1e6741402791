from .dit import init_wan_dit, wan_dit_forward, patchify_latent, unpatchify_tokens
