from refiners_tpu.foundationals.latent_diffusion.preprocessors.informative_drawings import InformativeDrawings

__all__ = ["InformativeDrawings"]
