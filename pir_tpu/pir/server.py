"""Placeholder — implemented later this round."""


class PirServer:  # pragma: no cover - placeholder
    pass
