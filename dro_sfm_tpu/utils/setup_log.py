"""File logging with git provenance.

Rebuild of `/root/reference/dro_sfm/utils/setup_log.py`: a run log file under
`logs/<name>.log` capturing the git sha and dirty diff at startup, so every
experiment records the exact code state.
"""
from __future__ import annotations

import logging
import os
import subprocess
from datetime import datetime


def git_info(repo_dir: str = ".") -> dict:
    """Current commit sha, branch, and dirty state (`setup_log.py:10-16`)."""
    def run(*args):
        try:
            return subprocess.run(
                ["git", *args], cwd=repo_dir, capture_output=True,
                text=True, timeout=10).stdout.strip()
        except Exception:
            return ""
    return {
        "sha": run("rev-parse", "HEAD"),
        "branch": run("rev-parse", "--abbrev-ref", "HEAD"),
        "dirty": bool(run("status", "--porcelain")),
        "diff": run("diff", "--stat"),
    }


def setup_log(name: str, log_dir: str = "logs",
              level: int = logging.INFO) -> logging.Logger:
    """Create the run logger with a file handler + provenance header."""
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(f"dro_sfm_tpu.{name}")
    logger.setLevel(level)
    path = os.path.join(log_dir, f"{name}.log")
    handler = logging.FileHandler(path)
    handler.setFormatter(logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s: %(message)s"))
    logger.addHandler(handler)

    info = git_info(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    logger.info("run %s started at %s", name, datetime.now().isoformat())
    logger.info("git sha=%s branch=%s dirty=%s",
                info["sha"], info["branch"], info["dirty"])
    if info["dirty"]:
        logger.info("dirty diff:\n%s", info["diff"])
    return logger
