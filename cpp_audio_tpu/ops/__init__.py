"""DSP primitives (reference L2 'audio elements', redesigned batched/parallel)."""
