"""Console-side startup utilities — the reference's `extras` surface.

Parity: `src/utils/utils.py:17-49` (extras) + `src/utils/rich_utils.py`
(print_config_tree :18-76, enforce_tags :79-103), re-implemented
dependency-free (no rich): a plain-text YAML tree with the reference's
print order, saved to ``config_tree.log`` / ``tags.log`` under
``paths.output_dir`` when requested, and a tag prompt that degrades to
the reference's "dev" default on non-interactive stdin (the reference
Prompt.ask default) instead of blocking an unattended run.
"""
from __future__ import annotations

import os
import sys
import warnings
from typing import Any, Dict, List, Optional, Sequence

# reference rich_utils.print_config_tree print_order (:20-28)
DEFAULT_PRINT_ORDER: Sequence[str] = (
    "data", "model", "callbacks", "logger", "trainer", "paths", "extras",
)


def _rank0() -> bool:
    """rank_zero_only analog (shared gate in parallel.platform.is_rank0)."""
    from ..parallel.platform import is_rank0

    return is_rank0()


def format_config_tree(
    cfg: Dict[str, Any],
    print_order: Sequence[str] = DEFAULT_PRINT_ORDER,
) -> str:
    """The reference's config tree as plain text: top-level groups in
    print_order first (absent ones skipped), remaining keys after, each
    group's subtree rendered as YAML (rich_utils.py:40-68)."""
    import yaml

    queue: List[str] = [f for f in print_order if f in cfg]
    queue += [f for f in cfg if f not in queue]

    lines: List[str] = ["CONFIG"]
    for field in queue:
        lines.append(f"├── {field}")
        group = cfg[field]
        if isinstance(group, dict):
            body = yaml.safe_dump(group, default_flow_style=False,
                                  sort_keys=False)
        else:
            body = str(group)
        for ln in body.rstrip("\n").split("\n"):
            lines.append(f"│   {ln}")
    return "\n".join(lines) + "\n"


def print_config_tree(
    cfg: Dict[str, Any],
    print_order: Sequence[str] = DEFAULT_PRINT_ORDER,
    save_to_file: bool = False,
) -> None:
    """Print the composed config at startup; optionally persist it to
    ``<paths.output_dir>/config_tree.log`` (rich_utils.py:71-75)."""
    if not _rank0():
        return
    text = format_config_tree(cfg, print_order)
    print(text, end="")
    if save_to_file:
        out_dir = (cfg.get("paths") or {}).get("output_dir")
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "config_tree.log"), "w") as f:
                f.write(text)


def enforce_tags(cfg: Dict[str, Any], save_to_file: bool = False) -> None:
    """Ensure the run has tags (rich_utils.py:79-103): prompt on an
    interactive stdin, otherwise fall back to the prompt's default
    ``["dev"]`` with a warning (an unattended TPU job must not block).
    Mutates ``cfg["tags"]`` in place."""
    from ..train.loggers import get_logger

    log = get_logger()
    if not cfg.get("tags"):
        # only rank 0 may touch stdin (the reference gates the whole
        # function @rank_zero_only); other ranks take the default silently
        if _rank0() and sys.stdin is not None and sys.stdin.isatty():
            log.warning("No tags provided in config. Prompting user...")
            raw = input("Enter a list of comma separated tags [dev]: ") or "dev"
        else:
            log.warning("No tags provided in config and stdin is not "
                        "interactive; defaulting tags to ['dev']")
            raw = "dev"
        cfg["tags"] = [t.strip() for t in raw.split(",") if t.strip()]
        log.info(f"Tags: {cfg['tags']}")

    if save_to_file and _rank0():
        out_dir = (cfg.get("paths") or {}).get("output_dir")
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "tags.log"), "w") as f:
                f.write(repr(cfg["tags"]) + "\n")


def extras(cfg: Dict[str, Any],
           print_order: Optional[Sequence[str]] = None) -> None:
    """Apply the optional pre-task utilities (reference utils.py:17-49):
    ignore_warnings, enforce_tags, print_config. The reference also sets
    torch matmul precision 'high' here; the TPU analog needs nothing —
    this build's default matmul precision is already bf16-level, and the
    geometry ops that need f32 pass Precision.HIGHEST explicitly."""
    from ..train.loggers import get_logger

    log = get_logger()
    ex = cfg.get("extras")
    if not ex:
        log.warning("Extras config not found! <cfg.extras=null>")
        return
    if ex.get("ignore_warnings"):
        log.info("Disabling python warnings <extras.ignore_warnings=True>")
        warnings.filterwarnings("ignore")
    if ex.get("enforce_tags"):
        enforce_tags(cfg, save_to_file=True)
    if ex.get("print_config"):
        print_config_tree(
            cfg, print_order or DEFAULT_PRINT_ORDER, save_to_file=True
        )
