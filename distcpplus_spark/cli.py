"""CLI shim with the reference's flag names and exit codes.

Usage (DistCPPlus.java:45-99 usage text, re-expressed):
  python -m distcpplus_spark.cli [options] <src...> <dst>

Flags: -update -overwrite -delete -i -p[rbugpt] -m <n> -f <urilist>
       -rg <dir> <regex> -regexPath <root> <rx1/rx2/...>
       -filelimit <n> -sizelimit <n> -mapper <module.fn>
       -log <logdir> -market <int>
Exit codes (DistCPPlus.java:312-332): 0 ok, -1 usage, -2 duplication,
-3 filesystem I/O (the reference unwraps RemoteException into
FileNotFound/AccessControl/QuotaExceeded and returns -3; the posix
analogue is FileNotFoundError/PermissionError/OSError surfaced at
plan time — missing source roots, unreadable listing dirs),
-999 other. Unknown flags are usage errors (-1).

-mapper takes a dotted Python path ("pkg.mod.fn" or "pkg.mod:fn") to
a copy_fn(rows, dst_root, tmp_root, preserve) callable — the
Class.forName pluggable-mapper surface (DistCPPlus.java:467-480)
re-expressed for Python.
"""

from __future__ import annotations

import sys

from distcpplus_spark.engine import CopyOptions, DistCpPlusEngine
from distcpplus_spark.operators.copier import CopyFailedError
from distcpplus_spark.plans.copy_plan import DuplicationError
from distcpplus_spark.session import get_spark


def parse_size(s: str) -> int:
    """Binary-suffix size parsing: 1230k, 891g (Options.java:24-33)."""
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1].lower() in mult:
        return int(s[:-1]) * mult[s[-1].lower()]
    return int(s)


def parse_args(argv: list[str]) -> tuple[list[str], str, CopyOptions, dict]:
    opts = dict(
        update=False, overwrite=False, delete=False, ignore_failures=False,
        skip_ts_check=False, skip_crc_check=False, preserve=frozenset(),
        file_limit=None, size_limit=None, max_tasks=None,
    )
    extra: dict = {
        "name_regex": None, "urilist": None, "depth_regexes": None,
        "mapper": None, "market": None,
    }
    paths: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-update":
            opts["update"] = True
        elif a == "-overwrite":
            opts["overwrite"] = True
        elif a == "-delete":
            opts["delete"] = True
        elif a == "-i":
            opts["ignore_failures"] = True
        elif a == "-skiptscheck":
            opts["skip_ts_check"] = True
        elif a == "-skipcrccheck":
            opts["skip_crc_check"] = True
        elif a.startswith("-p"):
            # bare -p ≡ -prbugp (NO timestamps), DistCPPlus.java:59
            opts["preserve"] = frozenset(a[2:]) or frozenset("rbugp")
        elif a == "-m":
            i += 1
            opts["max_tasks"] = int(argv[i])
        elif a == "-filelimit":
            i += 1
            opts["file_limit"] = int(argv[i])
        elif a == "-sizelimit":
            i += 1
            opts["size_limit"] = parse_size(argv[i])
        elif a == "-f":
            i += 1
            extra["urilist"] = argv[i]
        elif a == "-rg":
            i += 1
            src_dir = argv[i]
            i += 1
            extra["name_regex"] = argv[i]
            paths.append(src_dir)
        elif a == "-regexPath":
            # reference form (Arguments.java:202-225): root then a
            # slash-separated per-depth regex chain
            i += 1
            root = argv[i]
            i += 1
            extra["depth_regexes"] = argv[i].split("/")
            paths.append(root)
        elif a == "-mapper":
            i += 1
            extra["mapper"] = argv[i]
        elif a == "-market":
            # app-specific mapper parameter (DistCPPlus.java:121-122):
            # forwarded to a custom -mapper as market=<int>
            i += 1
            extra["market"] = int(argv[i])
        elif a == "-log":
            i += 1
            opts["log_dir"] = argv[i]
        elif a.startswith("-"):
            # usage error, not a traceback: main() maps this to -1
            raise ValueError(f"unknown flag: {a}")
        else:
            paths.append(a)
        i += 1
    if len(paths) < 2 and not extra["urilist"]:
        raise ValueError("need at least one source and a destination")
    dst = paths[-1]
    return paths[:-1], dst, CopyOptions(**opts), extra


def load_mapper(dotted: str):
    """Resolve a -mapper dotted path to a copy_fn callable — the
    Python analogue of Class.forName (DistCPPlus.java:467-480).
    Accepts "pkg.mod:fn" or "pkg.mod.fn"."""
    import importlib

    if ":" in dotted:
        mod_name, attr = dotted.split(":", 1)
    else:
        mod_name, _, attr = dotted.rpartition(".")
    if not mod_name or not attr:
        raise ValueError(f"-mapper needs a dotted path, got: {dotted!r}")
    mod = importlib.import_module(mod_name)
    return getattr(mod, attr)


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    try:
        srcs, dst, opts, extra = parse_args(argv)
    except (ValueError, IndexError) as e:
        print(f"usage error: {e}", file=sys.stderr)
        return -1

    spark = get_spark("distcpplus_cli")
    engine = DistCpPlusEngine(spark)
    try:
        if extra["urilist"]:
            from distcpplus_spark.sources.lister import read_uri_list

            srcs = read_uri_list(spark, extra["urilist"]) + srcs
        copy_fn = load_mapper(extra["mapper"]) if extra["mapper"] else None
        if copy_fn is not None and extra["market"] is not None:
            import functools

            copy_fn = functools.partial(copy_fn, market=extra["market"])
        stats = engine.copy(
            srcs,
            dst,
            opts,
            copy_fn=copy_fn,
            name_regex=extra["name_regex"],
            depth_regexes=extra["depth_regexes"],
        )
        print(
            f"COPY={stats['COPY']} SKIP={stats['SKIP']} FAIL={stats['FAIL']} "
            f"BYTESCOPIED={stats['BYTESCOPIED']}"
        )
        return 0
    except DuplicationError as e:
        print(f"duplication: {e}", file=sys.stderr)
        return -2
    except ValueError as e:
        # argument-shaped failures surfaced at plan time (empty -rg
        # match, option conflicts) are usage errors, matching the
        # reference's IllegalArgumentException -> -1 path
        print(f"usage error: {e}", file=sys.stderr)
        return -1
    except CopyFailedError as e:
        print(f"copy failed: {e}", file=sys.stderr)
        return -999
    except OSError as e:
        # the reference's RemoteException branch (DistCPPlus.java:
        # 319-326) unwraps FileNotFound/AccessControl/QuotaExceeded
        # and returns -3; locally those failures arrive as OSError
        # subclasses (InvalidInputError is a FileNotFoundError,
        # unreadable dirs raise PermissionError)
        print(f"io error: {e}", file=sys.stderr)
        return -3
    except Exception as e:
        print(f"error: {type(e).__name__}: {e}", file=sys.stderr)
        return -999


if __name__ == "__main__":
    raise SystemExit(main())
