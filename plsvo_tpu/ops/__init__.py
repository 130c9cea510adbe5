"""Per-frame numeric ops (L2 analogue of the reference's src/ ops layer)."""
