// Portions derived from flink-sql-toolkit (c) DafaWiratama,
// licensed under the MIT License (reference LICENSE.md) — the
// request/error-parse/poll logic below intentionally mirrors the
// client's own source (cited per block) so this harness is a
// faithful conformance oracle, not original engine code.
//
// Conformance harness: drives the gateway with the exact request
// sequences the reference VS Code client issues, re-expressed as a
// standalone Node script (Node 20+, global fetch; no dependencies).
//
// Behavior contracts exercised, with their reference sources:
//   - request/error parsing .......... src/flinkClient.ts:51-125
//     (two-element errors[], "<Exception on server side:\n…>" strip,
//      "Caused by:" extraction for the friendly message)
//   - createSession/checkSession ..... src/flinkClient.ts:127-142
//   - executeStatement ............... src/flinkClient.ts:144-150
//   - fetchResults field mapping ..... src/flinkClient.ts:154-172
//     (resultType fallback: PAYLOAD if rows present else NOT_READY)
//   - metadata poll loop ............. src/flinkClient.ts:305-338
//     (50ms retries, follow nextResultToken when defined, JSON-dedup)
//   - getTableSchema via DESCRIBE .... src/flinkClient.ts:494-500
//   - listTablesWithKind ............. src/flinkClient.ts:386-408
//     (SHOW TABLES minus case-insensitive SHOW VIEWS set)
//   - session auto-recovery .......... src/notebookController.ts:108-120
//     ("Session" + "does not exist" message match, reopen, retry)
//   - readiness poll ................. src/notebookController.ts:122-140
//     (token 0 until not NOT_READY, 500ms interval)
//   - streaming poll loop ............ src/notebookController.ts:221-246
//     (token++ per poll — sequential pages, NOT nextResultToken)
//   - cancelOperation ................ src/flinkClient.ts:269-296
//     (PATCH jobmanager ?mode=cancel best-effort, then POST cancel,
//      then DELETE close, tolerating already-finished)
//   - jobmanager overview/taskmanagers/jobs ... src/flinkClient.ts:190-239
//
// Usage: node node_client_harness.js <baseUrl> [sfDir]
// Prints one JSON report line; exits 0 iff every step passed.
'use strict';

const baseUrl = (process.argv[2] || '').replace(/\/$/, '');
const sfDir = process.argv[3] || '/root/testdata/sf0.001';
if (!baseUrl) {
  console.error('usage: node node_client_harness.js <baseUrl> [sfDir]');
  process.exit(2);
}

class FlinkServerError extends Error {
  constructor(message, stack, statusCode) {
    super(message);
    this.name = 'Flink Server Error';
    if (stack) this.stack = stack;
    this.statusCode = statusCode;
  }
}

// --- the client's transport: JSON in/out, errors[] parsed ---------------
async function request(endpoint, method = 'GET', body) {
  const response = await fetch(`${baseUrl}${endpoint}`, {
    method,
    headers: { 'Content-Type': 'application/json', Accept: 'application/json' },
    body: body ? JSON.stringify(body) : undefined,
  });
  if (!response.ok) {
    const text = await response.text();
    handleErrorResponse(response.status, text);
  }
  return response.json();
}

function handleErrorResponse(status, text) {
  let message = `Flink Gateway Error (${status})`;
  let stack;
  try {
    const data = JSON.parse(text);
    if (data.errors && Array.isArray(data.errors)) {
      if (data.errors.length > 0) message = data.errors[0];
      if (data.errors.length > 1) {
        const rawStack = data.errors[1]
          .replace(/^<Exception on server side:\n?/, '')
          .replace(/>$/, '');
        stack = rawStack;
        const causedBy = rawStack
          .split('\n')
          .filter((l) => l.trim().startsWith('Caused by:'));
        if (causedBy.length > 0) message += ` ${causedBy[causedBy.length - 1].trim()}`;
      }
    } else {
      message += `: ${text}`;
    }
  } catch {
    message += text.length > 500 ? `: ${text.substring(0, 500)}...` : `: ${text}`;
  }
  throw new FlinkServerError(message, stack, status);
}

const sleep = (ms) => new Promise((r) => setTimeout(r, ms));

async function createSession(sessionName) {
  const result = await request('/sessions', 'POST', { sessionName, properties: {} });
  return result.sessionHandle;
}

async function checkSession(h) {
  try {
    await request(`/sessions/${h}`, 'GET');
    return true;
  } catch {
    return false;
  }
}

async function executeStatement(h, statement) {
  const result = await request(`/sessions/${h}/statements`, 'POST', {
    statement,
    executionTimeout: 0,
  });
  return result.operationHandle;
}

// fetchResults with the client's exact field mapping + fallbacks
async function fetchResults(h, oh, token = 0) {
  const result = await request(`/sessions/${h}/operations/${oh}/result/${token}`, 'GET');
  return {
    results: result.results ? result.results.data : [],
    columns: result.results ? result.results.columns : [],
    resultKind: result.resultKind,
    resultType:
      result.resultType || (result.results?.data?.length > 0 ? 'PAYLOAD' : 'NOT_READY'),
    jobID: result.jobID,
    nextResultUri: result.nextResultUri,
    isQueryResult: result.isQueryResult || false,
    nextResultToken: result.nextResultToken,
  };
}

// the metadata poll loop: immediate fetch, then 50ms retries following
// nextResultToken when defined, JSON-stringify dedup of the rows
async function executeMetadataSql(h, sql) {
  const oh = await executeStatement(h, sql);
  let result = await fetchResults(h, oh, 0);
  let retries = 0;
  const rows = [];
  const pushRows = (r) => { if (r.results) rows.push(...r.results); };
  pushRows(result);
  while (result.resultType !== 'EOS' && retries < 200) {
    await sleep(50);
    result =
      result.nextResultToken !== undefined
        ? await fetchResults(h, oh, result.nextResultToken)
        : await fetchResults(h, oh, 0);
    pushRows(result);
    retries++;
  }
  const unique = [];
  const seen = new Set();
  for (const row of rows) {
    const key = JSON.stringify(row);
    if (!seen.has(key)) {
      seen.add(key);
      unique.push(row);
    }
  }
  return unique;
}

function getValue(row, index) {
  if (row && row.fields && Array.isArray(row.fields)) return String(row.fields[index]);
  if (Array.isArray(row)) return String(row[index]);
  return String(row);
}

async function getTableSchema(h, table) {
  const rows = await executeMetadataSql(h, `DESCRIBE \`${table}\``);
  return rows.map((r) => ({ name: getValue(r, 0), dataType: getValue(r, 1) }));
}

async function listTablesWithKind(h) {
  const tables = (await executeMetadataSql(h, 'SHOW TABLES')).map((r) => getValue(r, 0));
  const views = (await executeMetadataSql(h, 'SHOW VIEWS')).map((r) => getValue(r, 0));
  const viewSet = new Set(views.map((v) => v.toLowerCase()));
  const result = [];
  for (const t of tables) if (!viewSet.has(t.toLowerCase())) result.push({ name: t, kind: 'TABLE' });
  for (const v of views) result.push({ name: v, kind: 'VIEW' });
  return result;
}

async function cancelJob(jobId) {
  try {
    await fetch(`${baseUrl}/jobs/${jobId}?mode=cancel`, { method: 'PATCH' });
  } catch {
    /* best effort, the client only warns */
  }
}

async function cancelOperation(h, oh, jobId) {
  if (jobId) await cancelJob(jobId);
  try {
    await request(`/sessions/${h}/operations/${oh}/cancel`, 'POST');
    try {
      await request(`/sessions/${h}/operations/${oh}/close`, 'DELETE');
    } catch {
      /* already closed is fine */
    }
  } catch (error) {
    if (!/FINISHED|CANCELED/.test(error.message)) throw error;
  }
}

// --- the conformance scenario -------------------------------------------
const report = { ok: true, steps: {} };
function step(name, value) {
  report.steps[name] = value;
}
function fail(name, detail) {
  report.ok = false;
  report.steps[name] = { failed: true, detail: String(detail) };
}

async function main() {
  // liveness + jobmanager view
  const info = await request('/info');
  step('info', { productName: info.productName, hasVersion: !!info.version });

  let h = await createSession('node-conformance');
  step('createSession', { gotHandle: typeof h === 'string' && h.length > 0 });
  step('checkSession', await checkSession(h));

  // DDL + batch SELECT to EOS through the metadata poll loop
  await executeMetadataSql(h, "SET 'execution.runtime-mode' = 'batch'");
  await executeMetadataSql(
    h,
    'CREATE TABLE conf_nation (n_nationkey BIGINT, n_name STRING, ' +
      "n_regionkey BIGINT, n_comment STRING) WITH ('connector'='filesystem', " +
      `'path'='${sfDir}/nation.parquet', 'format'='parquet')`,
  );
  await executeMetadataSql(
    h,
    'CREATE VIEW conf_v AS SELECT n_regionkey, COUNT(*) AS cnt ' +
      'FROM conf_nation GROUP BY n_regionkey',
  );
  const rows = await executeMetadataSql(
    h,
    'SELECT n_nationkey, n_name FROM conf_nation ORDER BY n_nationkey LIMIT 5',
  );
  step('select', {
    rowCount: rows.length,
    first: getValue(rows[0], 1),
    kinds: rows.map((r) => r.kind),
  });

  // DESCRIBE → {name, dataType} mapping
  const schema = await getTableSchema(h, 'conf_nation');
  step('describe', schema);

  // SHOW TABLES / SHOW VIEWS with the view-set filter
  const objects = await listTablesWithKind(h);
  step('listTablesWithKind', objects);

  // error contract: errors[0] short message, errors[1] server stack
  try {
    await executeMetadataSql(h, 'SELECT * FROM conf_ghost_xyz');
    fail('errorShape', 'expected an error for a missing table');
  } catch (e) {
    step('errorShape', {
      isFlinkServerError: e instanceof FlinkServerError,
      statusCode: e.statusCode,
      message: e.message.substring(0, 200),
      hasServerStack: typeof e.stack === 'string' && e.stack.length > 0,
      stackUnwrapped: !/^<Exception on server side:/.test(e.stack || ''),
    });
  }

  // session auto-recovery: stale handle fails with the matchable
  // message; the client opens a fresh session and retries
  const stale = '00000000-0000-0000-0000-000000000000';
  try {
    await executeStatement(stale, 'SELECT 1');
    fail('recovery', 'stale handle unexpectedly accepted');
  } catch (e) {
    const matches = e.message.includes('Session') && e.message.includes('does not exist');
    h = await createSession('node-conformance-recovered');
    await executeMetadataSql(h, "SET 'execution.runtime-mode' = 'batch'");
    const retry = await executeMetadataSql(h, 'SELECT 1 AS x');
    step('recovery', {
      messageMatches: matches,
      retriedRows: retry.length,
      retriedValue: getValue(retry[0], 0),
    });
  }

  // streaming: readiness poll on token 0, then the token++ poll loop
  await executeMetadataSql(
    h,
    'CREATE TABLE conf_ev (event_id BIGINT, user_id BIGINT) WITH (' +
      "'connector'='filesystem', 'path'='" + sfDir.replace('sf0.001', 'sf0.01') +
      "/events.parquet', 'format'='parquet')",
  );
  await executeMetadataSql(h, "SET 'execution.runtime-mode' = 'streaming'");
  const oh = await executeStatement(h, 'SELECT event_id FROM conf_ev');
  let resultData = await fetchResults(h, oh, 0);
  let readyRetries = 0;
  while (resultData.resultType === 'NOT_READY' && readyRetries < 120) {
    await sleep(500);
    resultData = await fetchResults(h, oh, 0);
    readyRetries++;
  }
  let allResults = [...resultData.results];
  const jobId = resultData.jobID;
  let currentToken = 0;
  let consecutiveEmpty = 0;
  let duplicates = 0;
  const seenIds = new Set(allResults.map((r) => getValue(r, 0)));
  for (let poll = 0; poll < 30 && consecutiveEmpty < 5; poll++) {
    await sleep(250);
    currentToken++; // the controller's exact token strategy
    const nextData = await fetchResults(h, oh, currentToken);
    if (nextData.resultType === 'ERROR') throw new Error('streaming ERROR status');
    if (nextData.results.length > 0) {
      consecutiveEmpty = 0;
      for (const r of nextData.results) {
        const id = getValue(r, 0);
        if (seenIds.has(id)) duplicates++;
        else seenIds.add(id);
      }
      allResults.push(...nextData.results);
      if (allResults.length > 1000) allResults = allResults.slice(-1000);
    } else {
      consecutiveEmpty++;
    }
    if (nextData.resultType === 'EOS' || nextData.resultType === 'FINISHED') break;
  }
  await cancelOperation(h, oh, jobId);
  step('streaming', {
    isQueryResult: resultData.isQueryResult,
    collected: seenIds.size,
    duplicates,
    sawJobId: jobId !== undefined && jobId !== null,
  });

  // jobmanager view endpoints the status bar / providers poll
  const overview = await request('/overview');
  const tms = await request('/taskmanagers');
  const jobs = await request('/jobs/overview');
  step('jobmanager', {
    hasSlots: typeof overview['slots-total'] === 'number',
    taskmanagers: (tms.taskmanagers || []).length,
    jobsIsArray: Array.isArray(jobs.jobs),
  });

  // close both sessions (DELETE is idempotent)
  await request(`/sessions/${h}`, 'DELETE');
  step('closeSession', true);
}

main()
  .then(() => {
    console.log(JSON.stringify(report));
    process.exit(report.ok ? 0 : 1);
  })
  .catch((e) => {
    report.ok = false;
    report.error = `${e.name || 'Error'}: ${e.message}`;
    console.log(JSON.stringify(report));
    process.exit(1);
  });
