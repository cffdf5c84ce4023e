CREATE OR REPLACE TEMPORARY VIEW `public_example` AS
SELECT payload.*
FROM (
  SELECT payload, operation,
         ROW_NUMBER() OVER (
           PARTITION BY payload.`id`
           ORDER BY timestamp DESC, lsn DESC NULLS LAST,
                    sequence DESC NULLS LAST
         ) AS row_number
  FROM `public_example_raw`
)
WHERE row_number = 1 AND operation != 'DELETE'
