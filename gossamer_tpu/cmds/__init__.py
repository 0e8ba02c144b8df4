"""Command registry (reference ``src/GossCmdReg.cc``)."""

from __future__ import annotations


def all_goss_commands():
    from . import basic, contigs_cmd

    cmds = []
    cmds += basic.COMMANDS
    cmds += contigs_cmd.COMMANDS
    for mod_name in ("cleanup", "kmer_set_ops", "assembly", "misc", "more",
                     "taxo", "variants"):
        try:
            mod = __import__(f"gossamer_tpu.cmds.{mod_name}", fromlist=["COMMANDS"])
            cmds += mod.COMMANDS
        except ImportError:
            pass
    return cmds
