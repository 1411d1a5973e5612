"""CLI surface: reference main.py parity — site targeting (--sites a,b),
the default-exclusion table, and per-site CSV output shape
(reference: main.py:25-74 target/ignores, main.py:96-103 overwrite)."""

import csv

import pytest

from goto_eater_crawler_ray.pipelines.export import CSV_COLUMN_ORDER
from goto_eater_crawler_ray.sites import DEFAULT_IGNORES, SITE_SPECS, select_sites


class TestSelectSites:
    def test_explicit_target_wins_verbatim(self):
        # reference lets --target run even default-ignored crawlers
        assert select_sites("tochigi,miyagi") == ["tochigi", "miyagi"]
        assert select_sites("tokushima") == ["tokushima"]

    def test_default_applies_reference_ignores(self):
        chosen = select_sites(None)
        assert chosen  # something still runs
        assert not set(chosen) & set(DEFAULT_IGNORES)
        # the three principled exclusions (main.py:30-32)
        for name in ("tokyo_gnavi", "tokushima", "kochi"):
            assert name in DEFAULT_IGNORES
            assert name not in chosen

    def test_unknown_site_rejected(self):
        with pytest.raises(KeyError):
            select_sites("tochigi,narnia")

    def test_every_ignore_names_a_registered_spec(self):
        names = {s.name for s in SITE_SPECS}
        assert set(DEFAULT_IGNORES) <= names


@pytest.mark.usefixtures("ray_session")
class TestSiteCrawlCLI:
    def test_selected_sites_write_per_site_csvs(self, tmp_path):
        from goto_eater_crawler_ray.__main__ import main

        rc = main(["crawl", "--out", str(tmp_path), "--sites", "tochigi,miyagi"])
        assert rc == 0
        csv_dir = tmp_path / "csvs"
        assert sorted(p.name for p in csv_dir.iterdir()) == ["miyagi.csv", "tochigi.csv"]
        with open(csv_dir / "tochigi.csv", newline="") as f:
            rows = list(csv.reader(f))
        assert rows[0] == CSV_COLUMN_ORDER  # reference fixed 12-col order
        assert len(rows) > 1
        names = [r[0] for r in rows[1:]]
        assert names == sorted(names)  # csvsort parity
        # unselected sites wrote nothing
        assert not (csv_dir / "osaka.csv").exists()

    def test_overwrite_not_append(self, tmp_path):
        from goto_eater_crawler_ray.__main__ import main

        (tmp_path / "csvs").mkdir()
        stale = tmp_path / "csvs" / "tochigi.csv"
        stale.write_text("stale,junk\n1,2\n")
        main(["crawl", "--out", str(tmp_path), "--sites", "tochigi"])
        with open(stale, newline="") as f:
            rows = list(csv.reader(f))
        assert rows[0] == CSV_COLUMN_ORDER
        assert "stale" not in rows[0]
