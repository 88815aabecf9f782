"""Analysis / resynthesis / vocoder pipeline (reference L5b: rt.resynth)."""
