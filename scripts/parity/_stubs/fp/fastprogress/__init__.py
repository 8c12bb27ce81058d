"""No-op fastprogress stand-in (the reference trainer imports master_bar /
progress_bar / ConsoleMasterBar for UI only — no math flows through them)."""

from .fastprogress import ConsoleMasterBar, master_bar, progress_bar  # noqa: F401
