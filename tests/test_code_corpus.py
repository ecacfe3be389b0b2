"""Round-9 code-corpus tests (operators/code_corpus.py) behind
q431/q432."""

import json

import pytest

from rust_dataframe_spark.operators.code_corpus import (
    NotebookError,
    detect_license,
    detect_source_lang,
    ipynb_cells,
    parse_ipynb,
)


class TestIpynb:
    def test_cells_both_source_forms_outputs_counted(self):
        nb = {"nbformat": 4, "cells": [
            {"cell_type": "markdown", "source": ["# T\n", "text"]},
            {"cell_type": "code", "source": "a = 1\nb = 2\n",
             "execution_count": 3,
             "outputs": [{"output_type": "stream"},
                         {"output_type": "display_data"}]},
            {"cell_type": "code", "source": [], "execution_count": None,
             "outputs": []},
        ]}
        cells = parse_ipynb(json.dumps(nb).encode())
        assert [(c["cell_type"], c["n_lines"], c["execution_count"],
                 c["n_outputs"]) for c in cells] == [
            ("markdown", 2, None, 0), ("code", 2, 3, 2), ("code", 0, None, 0),
        ]
        # outputs are NOT in the extracted surface
        assert all("outputs" not in c for c in cells)

    def test_gates(self):
        with pytest.raises(NotebookError, match="nbformat 3"):
            parse_ipynb(json.dumps({"worksheets": []}).encode())
        with pytest.raises(NotebookError, match="JSON"):
            parse_ipynb(b"not json")
        with pytest.raises(NotebookError, match="cells"):
            parse_ipynb(json.dumps({"nbformat": 4}).encode())
        with pytest.raises(NotebookError, match="cell_type"):
            parse_ipynb(json.dumps({"cells": [{}]}).encode())

    def test_spark_explode(self, spark):
        from pyspark.sql import Row

        nb = {"nbformat": 4, "cells": [
            {"cell_type": "code", "source": "x=1\n", "execution_count": 1,
             "outputs": [{}]},
        ]}
        df = spark.createDataFrame(
            [Row(doc_id=1, payload=bytearray(json.dumps(nb).encode()))]
        )
        out = ipynb_cells(df).collect()
        assert [(r.cell_type, r.n_lines, r.n_outputs) for r in out] == [
            ("code", 1, 1),
        ]


class TestLicenseLang:
    def test_spdx_beats_phrase(self):
        txt = ("# SPDX-License-Identifier: GPL-3.0-only\n"
               "Permission is hereby granted, free of charge")
        assert detect_license(txt) == ("GPL-3.0-only", "spdx")

    def test_phrase_matrix(self):
        cases = {
            "Permission is hereby granted, free of charge, to any":
                "MIT",
            "Licensed under the Apache License, Version 2.0 (the":
                "Apache-2.0",
            "This is free and unencumbered software released": "Unlicense",
            "subject to the Mozilla Public License, v. 2.0": "MPL-2.0",
        }
        for text, lid in cases.items():
            assert detect_license(text) == (lid, "phrase"), lid

    def test_bsd_and_gpl_splits(self):
        bsd = "Redistribution and use in source and binary forms"
        assert detect_license(bsd) == ("BSD-2-Clause", "phrase")
        assert detect_license(bsd + " ... Neither the name of") == (
            "BSD-3-Clause", "phrase",
        )
        gpl = "GNU General Public License"
        assert detect_license(gpl + " version 3")[0] == "GPL-3.0"
        assert detect_license(gpl + " version 2")[0] == "GPL-2.0"
        assert detect_license(gpl)[0] == "GPL"

    def test_no_guessing(self):
        assert detect_license("def f():\n    return 1") == (None, None)
        assert detect_source_lang("Makefile") is None

    def test_lang_ext_and_shebang(self):
        assert detect_source_lang("A/B/X.PY") == "python"
        assert detect_source_lang("x.tsx") == "typescript"
        assert detect_source_lang("run", "#!/usr/bin/env python3") == "python"
        assert detect_source_lang("run", "#!/bin/bash") == "shell"
        # extension beats shebang
        assert detect_source_lang("x.rb", "#!/usr/bin/env python") == "ruby"
