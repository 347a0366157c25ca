"""Regenerate docs/CLI.md from the argparse surface of every entry point.

Usage: python scripts/gen_cli_docs.py > docs/CLI.md   (or `make cli-docs`)
"""
MODS = ["basecall", "chunkify", "train", "validate", "verify", "dump_json",
        "extract_reference", "align", "get_refs_from_sam", "model_convert"]


def main():
    print("# CLI reference\n")
    print("Every entry point of the reference (`bin/*.py`, `misc/align.py`) has a")
    print("`python -m sloika_tpu.cli.<name>` equivalent; this file is the dump of")
    print("each parser's `--help` (regenerate with `make cli-docs`).\n")
    for m in MODS:
        mod = __import__("sloika_tpu.cli." + m, fromlist=[m])
        print("## `python -m sloika_tpu.cli.{}`\n".format(m))
        parser = mod.make_parser() if hasattr(mod, "make_parser") else None
        if parser is None:
            print("_(no parser export)_\n")
            continue
        print("```text")
        print(parser.format_help().rstrip())
        print("```\n")
        if parser._subparsers:
            for act in parser._subparsers._group_actions:
                for name, sub in act.choices.items():
                    print("### `{} {}`\n".format(m, name))
                    print("```text")
                    print(sub.format_help().rstrip())
                    print("```\n")


if __name__ == "__main__":
    main()
