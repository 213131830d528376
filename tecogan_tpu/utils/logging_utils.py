"""Logging helpers.

The per-iteration log line format
``[epoch: E | iter: I | lr_G: x] k: v, ...`` is part of the de-facto API
(the training monitor parses it), so it is preserved exactly
(reference `base_model.py:191-202`).
"""

from __future__ import annotations

import logging


def setup_logger(name: str = "base"):
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter(fmt="%(asctime)s [%(levelname)s]: %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    return logger


def log_info(msg, logger_name: str = "base"):
    logging.getLogger(logger_name).info(msg)


def print_options(opt, logger_name: str = "base", tab: str = ""):
    for key, val in opt.items():
        if isinstance(val, dict):
            log_info(f"{tab}{key}:", logger_name)
            print_options(val, logger_name, tab + "  ")
        else:
            log_info(f"{tab}{key}: {val}", logger_name)


def format_train_msg(epoch, it, lr_dict, running_log):
    msg = f"[epoch: {epoch} | iter: {it}"
    for lr_type, lr in lr_dict.items():
        msg += f" | {lr_type}: {lr:.2e}"
    msg += "] "
    msg += ", ".join(f"{k}: {v:.3e}" for k, v in running_log.items())
    return msg
