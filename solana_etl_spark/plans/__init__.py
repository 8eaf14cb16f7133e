from solana_etl_spark.plans.views import (
    balance_changes_view,
    instructions_view,
    token_balance_changes_view,
    transactions_view,
    transfers_view,
)
from solana_etl_spark.plans.tasks import (
    blocks_task,
    transactions_task,
    transfers_task,
    run_all_tasks,
)

__all__ = [
    "transactions_view",
    "balance_changes_view",
    "token_balance_changes_view",
    "instructions_view",
    "transfers_view",
    "transactions_task",
    "transfers_task",
    "blocks_task",
    "run_all_tasks",
]
