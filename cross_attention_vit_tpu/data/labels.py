"""Label ingest and hygiene for the UCSF-PDGM cohort.

Reproduces the reference's `clean_data` exactly (dataset_ucsf.py:160-168):
  1. drop rows whose ID contains any blacklisted substring
     ('138','181','175','278','289','315');
  2. zero-pad the numeric suffix of the dash-separated ID to 4 digits so IDs
     match the on-disk folder names (UCSF-PDGM-0085);
  3. drop rows whose target is 'indeterminate' or NaN;
  4. binarize: target == 'positive' → 1.0 else 0.0 (float).
"""

from __future__ import annotations

import pandas as pd

BLACKLIST = ("138", "181", "175", "278", "289", "315")


def load_labels(csv_path: str) -> pd.DataFrame:
    return pd.read_csv(csv_path)


def clean_data(data: pd.DataFrame, target: str) -> pd.DataFrame:
    pattern = "|".join(BLACKLIST)
    data = data[~data["ID"].str.contains(pattern)]
    data = data.copy()
    data.loc[:, "ID"] = data["ID"].apply(
        lambda x: "-".join([*x.split("-")[:-1], x.split("-")[-1].zfill(4)])
    )
    data = data[~((data[target] == "indeterminate") | (data[target].isna()))]
    data = data.copy()
    data[target] = (data[target] == "positive").astype(float)
    return data


def train_val_test_split(data: pd.DataFrame, test_size: float, val_size: float,
                         seed: int):
    """The live driver's split scheme: 15% test then 18% val off the remainder
    (≈15% of the total), same seed for both (main_mist.py:167, 182)."""
    from sklearn.model_selection import train_test_split

    rest, test_df = train_test_split(data, test_size=test_size, random_state=seed)
    train_df, val_df = train_test_split(rest, test_size=val_size, random_state=seed)
    return train_df, val_df, test_df
