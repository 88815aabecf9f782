"""Engine core: events, voice scheduling, render loop (reference L3/L4)."""
