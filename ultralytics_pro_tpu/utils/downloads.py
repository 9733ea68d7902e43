"""Download / archive utilities (reference ultralytics/utils/downloads.py:
`safe_download:274`, `unzip_file`, `download:479`, `attempt_download_asset:424`).

Same semantics re-homed for this stack: retried fetch with size check, zip
handling with top-level-dir detection, threaded batch download, and asset
resolution against the local weights dir. `file://` URLs and plain paths work
offline; http(s) needs a networked environment (zero-egress here -> a clear
error, never a hang).
"""

from __future__ import annotations

import shutil
import urllib.error
import urllib.parse
import urllib.request
import zipfile
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterable, Optional

from ultralytics_pro_tpu.utils import LOGGER

# Reference publishes GitHub release assets (downloads.py:GITHUB_ASSETS_NAMES);
# in this stack checkpoints are .ckpt trees produced by our exporter, plus
# converted .npz weights from tools/convert_pt.py.
GITHUB_ASSETS_STEMS = [
    f"yolov8{s}" for s in "nsmlx"] + [f"yolo11{s}" for s in "nsmlx"] + [
    f"yolov5{s}" for s in "nsmlx"] + ["rtdetr-l", "rtdetr-x", "sam_b", "sam_l"]


def is_url(url, check: bool = False) -> bool:
    """True if the string parses as a URL (reference downloads.py:is_url)."""
    try:
        r = urllib.parse.urlparse(str(url))
        ok = all([r.scheme, r.netloc]) or r.scheme == "file"
        if ok and check:
            with urllib.request.urlopen(str(url)) as resp:  # noqa: S310
                return resp.getcode() == 200
        return ok
    except Exception:
        return False


def unzip_file(file, path=None, exclude=(".DS_Store", "__MACOSX"),
               exist_ok: bool = False) -> Path:
    """Unzip preserving the reference's top-level-dir rule
    (downloads.py:unzip_file): if the archive has no single top directory,
    extract into a directory named after the zip stem."""
    file = Path(file)
    path = Path(path or file.parent)
    with zipfile.ZipFile(file) as z:
        names = [n for n in z.namelist() if not any(x in n for x in exclude)]
        tops = {n.split("/")[0] for n in names}
        if len(tops) == 1 and names and names[0].split("/")[0] == next(iter(tops)) \
                and any(n.count("/") for n in names):
            extract_to, target = path, path / next(iter(tops))
        else:  # loose files: contain them in a dir named after the zip
            extract_to = target = path / file.stem
        if target.exists() and any(target.iterdir()) and not exist_ok:
            LOGGER.info(f"skipping unzip: {target} already populated")
            return target
        for n in names:
            z.extract(n, extract_to)
    return target


def zip_directory(directory, compress: bool = True, exclude=(".DS_Store",)) -> Path:
    """Zip a directory's contents into <dir>.zip (reference
    downloads.py:zip_directory)."""
    directory = Path(directory)
    zf = directory.with_suffix(".zip")
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(zf, "w", comp) as z:
        for f in sorted(directory.rglob("*")):
            if f.is_file() and not any(x in f.name for x in exclude):
                z.write(f, f.relative_to(directory))
    return zf


def safe_download(
    url,
    file=None,
    dir=None,
    unzip: bool = True,
    delete: bool = False,
    retry: int = 3,
    min_bytes: float = 1.0,
    exist_ok: bool = False,
) -> Path:
    """Fetch `url` to `dir/file` with retries + size validation, then
    optionally unzip (reference downloads.py:safe_download). Local paths and
    file:// URLs copy instead of fetch."""
    url = str(url)
    name = file or Path(urllib.parse.urlparse(url).path).name or "download"
    dest = Path(dir or ".") / name if dir else Path(name)
    dest.parent.mkdir(parents=True, exist_ok=True)

    src = Path(url.replace("file://", "")) if url.startswith("file://") or "://" not in url else None
    # reuse an existing download only if it passes size AND archive-integrity
    # checks — a truncated zip from an interrupted fetch must re-download
    reusable = (dest.exists() and dest.stat().st_size >= min_bytes
                and (dest.suffix != ".zip" or zipfile.is_zipfile(dest)))
    if reusable:
        pass
    elif src is not None:
        if not src.exists():
            raise FileNotFoundError(f"local source {src} not found")
        shutil.copy2(src, dest)
    else:
        err = None
        for attempt in range(retry):
            try:
                with urllib.request.urlopen(url, timeout=30) as resp, open(dest, "wb") as f:  # noqa: S310
                    shutil.copyfileobj(resp, f)
                break
            except (urllib.error.URLError, OSError) as e:
                err = e
                LOGGER.warning(f"download attempt {attempt + 1}/{retry} failed: {e}")
        else:
            raise ConnectionError(
                f"failed to download {url} after {retry} attempts (zero-egress "
                f"environment? place the file locally and pass its path)") from err
    if dest.stat().st_size < min_bytes:
        dest.unlink(missing_ok=True)
        raise ValueError(f"downloaded file {dest} smaller than min_bytes={min_bytes}")
    if unzip and dest.suffix == ".zip":
        out = unzip_file(dest, path=dest.parent, exist_ok=exist_ok)
        if delete:
            dest.unlink()
        return out
    return dest


def download(urls: Iterable, dir=".", unzip: bool = True, delete: bool = False,
             threads: int = 1, retry: int = 3, exist_ok: bool = False):
    """Threaded batch download (reference downloads.py:download)."""
    urls = [urls] if isinstance(urls, (str, Path)) else list(urls)
    if threads > 1:
        with ThreadPoolExecutor(max_workers=threads) as pool:
            return list(pool.map(
                lambda u: safe_download(u, dir=dir, unzip=unzip, delete=delete,
                                        retry=retry, exist_ok=exist_ok), urls))
    return [safe_download(u, dir=dir, unzip=unzip, delete=delete, retry=retry,
                          exist_ok=exist_ok) for u in urls]


def attempt_download_asset(file, repo: str = "ultralytics/assets",
                           release: str = "latest") -> str:
    """Resolve a weight asset: existing path wins; otherwise look in the
    settings weights dir; otherwise raise with the URL the reference would
    fetch (reference downloads.py:attempt_download_asset — actual GitHub
    fetch needs a networked environment)."""
    file = Path(str(file).strip())
    if file.exists():
        return str(file)
    from ultralytics_pro_tpu.utils.settings import SETTINGS

    wdir = Path(SETTINGS.get("weights_dir", "weights"))
    cand = wdir / file.name
    if cand.exists():
        return str(cand)
    url = f"https://github.com/{repo}/releases/download/{release}/{file.name}"
    raise FileNotFoundError(
        f"asset {file} not found locally (searched ./ and {wdir}); in a "
        f"networked environment it would be fetched from {url} — download it "
        f"there and place it in {wdir}")
