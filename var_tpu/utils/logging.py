"""CSV progress logging (reference: RL.py:230-243, VAR/pretext_VAR.py:88-91)."""
from __future__ import annotations

import os
from typing import Dict, List


class CSVLogger:
    """Append-mode CSV with the reference's header-once behavior."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, row: Dict):
        import pandas as pd

        df = pd.DataFrame({k: [v] for k, v in row.items()})
        if os.path.exists(self.path):
            df.to_csv(self.path, mode="a", header=False, index=False)
        else:
            df.to_csv(self.path, mode="w", header=True, index=False)
