"""stub — filled in during round 1."""
