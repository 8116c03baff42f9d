import json
from pathlib import Path

import numpy as np

GOLDEN_DIR = Path(__file__).resolve().parent / "golden"


def load_golden(name):
    data = json.loads((GOLDEN_DIR / f"{name}.json").read_text())
    return {k: (np.asarray(v, dtype=np.float32)
                if isinstance(v, list) and not isinstance(v[0], str) else v)
            for k, v in data.items()}
