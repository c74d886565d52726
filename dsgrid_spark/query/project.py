"""Project configuration: base / subset / supplemental dimension categories.

Reference dsgrid/dimension/base_models.py:46-51 (DimensionCategory) and
dsgrid/config/project_config.py: a project declares, per dimension type,
one BASE dimension, optional SUBSET selectors (named subsets of base
records), and optional SUPPLEMENTAL dimensions (alternate groupings
reached through a base→supplemental mapping table).

The payoff is ergonomic: a query names a subset or supplemental dimension
by NAME and the engine resolves the record ids / mapping join itself
(reference dsgrid/project.py:205-250) — the user never hands the join
graph to the query.
"""

from __future__ import annotations

from typing import Optional

from pydantic import BaseModel, Field


class SubsetDimensionModel(BaseModel):
    """Named subset of base records (reference
    project_config.py:69-97 SubsetDimensionSelectorModel)."""

    name: str
    #: physical base column this subset selects over (e.g. "geography")
    dimension_type: str
    record_ids: list[str]


class SupplementalDimensionModel(BaseModel):
    """Alternate grouping of a base dimension, reached through a
    registered base→supplemental mapping (reference
    project_config.py:214-230 SupplementalDimensionModel)."""

    name: str
    dimension_type: str
    #: registered mapping name with from_id=base, to_id=supplemental
    mapping: str


class ProjectConfig(BaseModel):
    """Reference project_config.py DimensionsModel, reduced to the query
    surface: which dimension records are base, and how names resolve."""

    project_id: str
    #: dimension_type (physical column) -> registered dimension name
    base_dimensions: dict[str, str] = Field(default_factory=dict)
    subset_dimensions: list[SubsetDimensionModel] = Field(default_factory=list)
    supplemental_dimensions: list[SupplementalDimensionModel] = Field(
        default_factory=list
    )

    def subset(self, name: str) -> Optional[SubsetDimensionModel]:
        for s in self.subset_dimensions:
            if s.name == name:
                return s
        return None

    def supplemental(self, name: str) -> Optional[SupplementalDimensionModel]:
        for s in self.supplemental_dimensions:
            if s.name == name:
                return s
        return None

    def dimension_names(self, category: str) -> list[str]:
        """reference project_config.py list_dimension_names(category)."""
        if category == "base":
            return sorted(self.base_dimensions.values())
        if category == "subset":
            return sorted(s.name for s in self.subset_dimensions)
        if category == "supplemental":
            return sorted(s.name for s in self.supplemental_dimensions)
        raise ValueError(f"unknown dimension category {category!r}")
