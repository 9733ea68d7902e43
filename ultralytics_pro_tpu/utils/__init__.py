"""Runtime utilities: logging, YAML IO, simple namespaces, paths.

Behavioral parity notes reference upstream call sites as file:line of the
reference tree (e.g. ultralytics/utils/__init__.py:384 LOGGER) without copying
its implementation.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import yaml

# Package root (ultralytics_pro_tpu/) and repo root.
PKG_ROOT = Path(__file__).resolve().parents[1]
REPO_ROOT = PKG_ROOT.parent
DEFAULT_CFG_PATH = PKG_ROOT / "cfg" / "default.yaml"

# Rank gating: in JAX SPMD there is one process per host; only host 0 logs.
# (Reference gates on RANK in {-1, 0}; ultralytics/utils/__init__.py:33.)


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


VERBOSE = str(os.getenv("UPT_VERBOSE", "true")).lower() == "true"


def set_logging(name: str = "ultralytics_pro_tpu", verbose: bool = True) -> logging.Logger:
    level = logging.INFO if (verbose and _process_index() == 0) else logging.ERROR
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("%(message)s"))
        handler.setLevel(level)
        logger.addHandler(handler)
    logger.propagate = False
    return logger


LOGGER = set_logging(verbose=VERBOSE)


def colorstr(*args):
    """Color a string for terminal output, e.g. colorstr('blue', 'bold', 'hello')."""
    *colors, string = args if len(args) > 1 else ("blue", "bold", args[0])
    codes = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_red": "\033[91m", "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "bold": "\033[1m", "underline": "\033[4m",
    }
    end = "\033[0m"
    return "".join(codes.get(c, "") for c in colors) + f"{string}" + end


class IterableSimpleNamespace(SimpleNamespace):
    """SimpleNamespace that iterates like a dict and prints its keys."""

    def __iter__(self):
        return iter(vars(self).items())

    def __str__(self):
        return "\n".join(f"{k}={v}" for k, v in vars(self).items())

    def get(self, key, default=None):
        return getattr(self, key, default)


def _lenient_yaml_fixes(text: str) -> str:
    """Repair the syntax slips found across the reference's model-yaml tree
    (32 files stock pyyaml rejects): trailing commas after flow sequences
    (with or without trailing comments), literal tabs, and a missing comma
    between a module name and its args list."""
    import re

    t = text.replace("\t", "  ")
    t = re.sub(r",\s*\]", "]", t)
    # stray comma after a block-style row's closing bracket (only `- [...]`,
    # rows — flow-style multi-line lists NEED their separators)
    t = re.sub(r"^(\s*- .*\]),\s*(#.*)?$",
               lambda m: m.group(1) + " " + (m.group(2) or ""), t, flags=re.M)
    t = re.sub(r",\s*(\w+) (\[)", r", \1, \2", t)  # 'Name [args' -> 'Name, [args'
    return t


def yaml_load(file, append_filename: bool = False) -> dict:
    """Load a YAML file to dict (utf-8, ignores non-serializable). Files the
    stock parser rejects get one lenient retry (the reference tree ships 32
    model yamls with trailing commas/tabs that its own loader cannot read)."""
    path = Path(file)
    with open(path, errors="ignore", encoding="utf-8") as f:
        text = f.read()
    try:
        data = yaml.safe_load(text) or {}
    except yaml.YAMLError:
        data = yaml.safe_load(_lenient_yaml_fixes(text)) or {}
        LOGGER.warning(f"{path}: invalid YAML repaired by the lenient loader "
                       "(trailing commas/tabs)")
    if append_filename:
        data["yaml_file"] = str(path)
    return data


def yaml_save(file, data: dict) -> None:
    path = Path(file)
    path.parent.mkdir(parents=True, exist_ok=True)
    clean = {k: (str(v) if isinstance(v, Path) else v) for k, v in data.items()}
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(clean, f, sort_keys=False, allow_unicode=True)


def yaml_print(file_or_dict) -> None:
    data = yaml_load(file_or_dict) if isinstance(file_or_dict, (str, Path)) else file_or_dict
    LOGGER.info(yaml.safe_dump(data, sort_keys=False, allow_unicode=True))


class TQDM:
    """Minimal in-house progress bar (reference keeps its own: utils/tqdm.py:18).

    Iterates an iterable while printing `desc i/n elapsed` lines at a throttled
    rate; silent off host 0 or when not a TTY.
    """

    def __init__(self, iterable=None, total=None, desc="", disable=False, **kwargs):
        self.iterable = iterable
        self.total = total if total is not None else (len(iterable) if hasattr(iterable, "__len__") else None)
        self.desc = desc
        self.disable = disable or _process_index() != 0
        self.n = 0
        self._t0 = time.time()
        self._last = 0.0

    def __iter__(self):
        for item in self.iterable:
            yield item
            self.update(1)
        self.close()

    def update(self, n=1):
        self.n += n
        now = time.time()
        if not self.disable and (now - self._last > 0.5 or self.n == self.total):
            total = f"/{self.total}" if self.total else ""
            LOGGER.info(f"{self.desc} {self.n}{total} [{now - self._t0:.1f}s]")
            self._last = now

    def set_description(self, desc):
        self.desc = desc

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class SimpleClass:
    """Base class giving readable repr of public attributes."""

    def __str__(self):
        attrs = []
        for k, v in vars(self).items():
            if not k.startswith("_"):
                attrs.append(f"{k}: {v.__class__.__name__}")
        return f"{self.__class__.__name__}({', '.join(attrs)})"

    __repr__ = __str__


class Profile:
    """Context-manager/decorator timer; accumulates dt over uses.

    TPU analogue of the CUDA-synchronized ops.Profile (reference utils/ops.py:18):
    callers must block_until_ready() the arrays they time.
    """

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.dt = time.perf_counter() - self._start
        self.t += self.dt

    def __str__(self):
        return f"{self.t:.4f}s"


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, exp3, ... (reference utils/files.py:106)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        base, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{base}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


class TryExcept:
    """Context manager/decorator that logs instead of raising (reference
    utils/__init__.py:959)."""

    def __init__(self, msg: str = "", verbose: bool = True):
        self.msg = msg
        self.verbose = verbose

    def __call__(self, func):
        import functools

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            with self:
                return func(*args, **kwargs)

        return wrapper

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, tb):
        if self.verbose and value:
            LOGGER.info(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True


class Retry:
    """Retry decorator with exponential backoff (reference utils/__init__.py:998)."""

    def __init__(self, times: int = 3, delay: float = 2.0):
        self.times = times
        self.delay = delay

    def __call__(self, func):
        import functools

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            attempt = 0
            while True:
                try:
                    return func(*args, **kwargs)
                except Exception as e:
                    attempt += 1
                    if attempt > self.times:
                        raise
                    LOGGER.info(f"Retry {attempt}/{self.times}: {e}")
                    time.sleep(self.delay * (2 ** (attempt - 1)))

        return wrapper


def threaded(func):
    """Run in a daemon thread when threaded=True kwarg (reference :1042)."""
    import functools
    import threading

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if kwargs.pop("threaded", True):
            t = threading.Thread(target=func, args=args, kwargs=kwargs, daemon=True)
            t.start()
            return t
        return func(*args, **kwargs)

    return wrapper


class ThreadingLocked:
    """Decorator serializing calls with a lock (reference :463)."""

    def __init__(self):
        import threading

        self.lock = threading.Lock()

    def __call__(self, f):
        import functools

        @functools.wraps(f)
        def decorated(*args, **kwargs):
            with self.lock:
                return f(*args, **kwargs)

        return decorated


# environment sniffers (reference utils/__init__.py:632-793)
def is_colab() -> bool:
    return "COLAB_RELEASE_TAG" in os.environ or "COLAB_BACKEND_VERSION" in os.environ


def is_kaggle() -> bool:
    return os.environ.get("PWD") == "/kaggle/working"


def is_docker() -> bool:
    try:
        return Path("/.dockerenv").exists() or "docker" in Path("/proc/self/cgroup").read_text()
    except Exception:
        return False


def is_pytest_running() -> bool:
    return "PYTEST_CURRENT_TEST" in os.environ or "pytest" in sys.modules


def is_tpu_vm() -> bool:
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False
