"""Reference region + BED parsing (reference analog ``src/remora/io.py:45–144``)."""

import re
from collections import defaultdict
from dataclasses import dataclass

from remora_tpu import RemoraError


@dataclass
class RefRegion:
    ctg: str
    strand: str
    start: int
    end: int = None

    @property
    def len(self):
        if self.end is None:
            return 1
        return self.end - self.start

    @classmethod
    def parse_ref_region_str(cls, ref_reg_str, req_strand=True):
        mat = re.match(
            r"^(?P<ctg>.+):(?P<st>\d+)-(?P<en>\d+):(?P<strand>[\+\-])$"
            if req_strand
            else r"^(?P<ctg>.+):(?P<st>\d+)-(?P<en>\d+)(:(?P<strand>[\+\-]))?$",
            ref_reg_str,
        )
        if mat is None:
            raise RemoraError(f"Invalid reference region: {ref_reg_str}")
        start = int(mat.group("st")) - 1
        if start < 0:
            raise RemoraError("Invalid reference start coordinate")
        return cls(
            ctg=mat.group("ctg"),
            strand=mat.group("strand"),
            start=start,
            end=int(mat.group("en")),
        )

    @property
    def coord_range(self):
        return range(self.start, self.end)

    def adjust(self, start_adjust=0, end_adjust=0, ref_orient=True):
        """Expanded/shifted copy; read-oriented adjustment flips for '-'."""
        if ref_orient or self.strand == "+":
            end_coord = None if self.end is None else self.end + end_adjust
            return RefRegion(
                self.ctg, self.strand, self.start + start_adjust, end_coord
            )
        end_coord = None if self.end is None else self.end - start_adjust
        return RefRegion(self.ctg, self.strand, self.start - end_adjust, end_coord)


def parse_bed_lines(bed_path):
    with open(bed_path) as fh:
        for line in fh:
            fields = line.split()
            if len(fields) < 3:
                continue
            ctg, st, en = fields[:3]
            strand = (
                None if len(fields) < 6 or fields[5] not in "+-" else fields[5]
            )
            yield RefRegion(ctg, strand, int(st), int(en))


def parse_bed(bed_path):
    """(ctg, strand) -> set of positions covered by the BED file."""
    regs = defaultdict(set)
    for reg in parse_bed_lines(bed_path):
        strands = "+-" if reg.strand is None else reg.strand
        for strand in strands:
            regs[(reg.ctg, strand)].update(reg.coord_range)
    return dict(regs)


def parse_mods_bed(bed_path):
    """(ctg, strand) -> {pos: mod_name}; also returns the set of mods seen."""
    regs = defaultdict(dict)
    all_mods = set()
    with open(bed_path) as fh:
        for line in fh:
            fields = line.split()
            ctg, st, en, mod = fields[:4]
            all_mods.add(mod)
            strands = (
                "+-" if len(fields) < 6 or fields[5] not in "+-" else fields[5]
            )
            for strand in strands:
                for pos in range(int(st), int(en)):
                    regs[(ctg, strand)][pos] = mod
    return dict(regs), all_mods
