"""Foundation utilities (equivalents of the reference's cpp.algorithms layer)."""
