from .classorder import Classorder, ClassorderTest
from .synth_structure import synthesize_triplets, synthesize_features

__all__ = ["Classorder", "ClassorderTest", "synthesize_triplets", "synthesize_features"]
