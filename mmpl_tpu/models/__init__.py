"""Model zoo: Wan DiT variants, causal 3D VAE, umT5, CLIP."""
