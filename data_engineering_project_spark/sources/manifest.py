"""File-ingestion manifest — the reference's ``_manifest.json``
(scripts/esplosione_dati.py:34-44,160-165,194-201).

Control-plane state (file name → content fingerprint + row count +
UTC timestamp), kept driver-side as JSON exactly like the reference:
it is metadata about a handful of files per batch, never data.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from typing import Any


def load_manifest(path: str) -> dict[str, Any]:
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    return {"files": {}}


def save_manifest(path: str, manifest: dict[str, Any]) -> None:
    manifest["updated_at"] = datetime.now(timezone.utc).isoformat()
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    os.replace(tmp, path)  # atomic swap, like the reference's rewrite


def record_file(
    manifest: dict[str, Any], file_name: str, fingerprint: str, rows: int
) -> None:
    manifest["files"][file_name] = {
        "fingerprint": fingerprint,
        "rows": rows,
        "processed_at": datetime.now(timezone.utc).isoformat(),
    }


def fingerprint_changed(
    manifest: dict[str, Any], file_name: str, fingerprint: str
) -> bool:
    """True when the file is new or its content fingerprint moved —
    the reference's skip test (scripts/esplosione_dati.py:147-151)."""
    entry = manifest["files"].get(file_name)
    return entry is None or entry["fingerprint"] != fingerprint
