"""Download helpers — parity with basicsr/utils/download_util.py:8-64.

Gated on `requests` (zero-egress environments simply raise).
"""

from __future__ import annotations

import math
import os


def network_available(host: str = "docs.google.com",
                      timeout: float = 3.0) -> bool:
    """Egress gate for the download CLIs: True when `requests` exists AND
    the host resolves+connects (zero-egress deployments fail fast here
    instead of mid-transfer)."""
    try:
        import requests  # noqa: F401
    except ImportError:
        return False
    import socket
    try:
        with socket.create_connection((host, 443), timeout=timeout):
            return True
    except OSError:
        return False


def download_file_from_google_drive(file_id: str, save_path: str) -> None:
    """Reference gdrive downloader behavior (ref :8-40)."""
    try:
        import requests
    except ImportError as e:
        raise RuntimeError("requests is not available; download the file "
                           "manually") from e

    session = requests.Session()
    url = "https://docs.google.com/uc?export=download"
    params = {"id": file_id}
    response = session.get(url, params=params, stream=True)
    token = None
    for key, value in response.cookies.items():
        if key.startswith("download_warning"):
            token = value
    if token:
        params["confirm"] = token
        response = session.get(url, params=params, stream=True)
    save_response_content(response, save_path)


def save_response_content(response, destination: str,
                          chunk_size: int = 32768) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(destination)), exist_ok=True)
    with open(destination, "wb") as f:
        for chunk in response.iter_content(chunk_size):
            if chunk:
                f.write(chunk)


def load_file_from_url(url: str, model_dir: str = "pretrained",
                       file_name: str | None = None) -> str:
    """torch.hub-style URL fetch with a local cache path."""
    try:
        import requests
    except ImportError as e:
        raise RuntimeError("requests is not available") from e
    os.makedirs(model_dir, exist_ok=True)
    name = file_name or url.split("/")[-1]
    path = os.path.join(model_dir, name)
    if not os.path.exists(path):
        r = requests.get(url, stream=True)
        r.raise_for_status()
        save_response_content(r, path)
    return path
