"""(populated in subsequent milestones)"""
