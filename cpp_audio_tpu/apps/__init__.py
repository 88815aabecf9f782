"""Command-line apps mirroring the reference's xcode schemes (SURVEY §2.8):
birds, tune, resynth, rt.resynth.job, and the WAV utilities."""
